"""Products (diagnostics) layer — parity targets the reference's ~70 products
(``PySDM/products/``); populated incrementally per SURVEY.md §2.11."""

from .impl import Product, MomentProduct
from .size_spectral import (
    ParticleVolumeVersusRadiusLogarithmSpectrum,
    ParticleSizeSpectrumPerVolume,
    ParticleSizeSpectrumPerMassOfDryAir,
    TotalParticleConcentration,
    TotalParticleSpecificConcentration,
    ParticleConcentration,
    ParticleSpecificConcentration,
    ActivatedParticleConcentration,
    ActivatedParticleSpecificConcentration,
    ActivatedMeanRadius,
    ActivatedEffectiveRadius,
    MeanRadius,
    MeanVolumeRadius,
    NumberSizeSpectrum,
    RadiusBinnedNumberAveragedTerminalVelocity,
    RadiusStandardDeviation,
    AreaStandardDeviation,
    VolumeStandardDeviation,
    WaterMixingRatio,
    EffectiveRadius,
    CloudWaterContent,
    SpecificCloudWaterContent,
    LiquidWaterContent,
    SpecificLiquidWaterContent,
    make_arbitrary_moment_product,
    ZerothMoment,
    VolumeFirstMoment,
    VolumeSecondMoment,
    RadiusFirstMoment,
    RadiusSixthMoment,
)
from .housekeeping import (
    WallTime,
    CPUTime,
    DynamicWallTime,
    SuperDropletCountPerGridbox,
    Time,
)
from .collision import (
    CollisionRatePerGridbox,
    CollisionRateDeficitPerGridbox,
    CoalescenceRatePerGridbox,
    BreakupRatePerGridbox,
    BreakupRateDeficitPerGridbox,
    CollisionTimestepMean,
    CollisionTimestepMin,
)
from .freezing import (
    IceWaterContent,
    SpecificIceWaterContent,
    FrozenParticleConcentration,
    FrozenParticleSpecificConcentration,
    FrozenFraction,
    IceNucleiConcentration,
    SpecificIceNucleiConcentration,
    TotalUnfrozenImmersedSurfaceArea,
    FreezableSpecificConcentration,
    CoolingRate,
)
from .chemistry import (
    Acidity,
    AqueousMoleFraction,
    GaseousMoleFraction,
    TotalDryMassMixingRatio,
    AqueousMassSpectrum,
    SpecificAqueousMassSpectrum,
)
from .ambient_thermodynamics import (
    AmbientTemperature,
    AmbientPressure,
    AmbientRelativeHumidity,
    AmbientRelativeHumidityWrtIce,
    AmbientDryAirDensity,
    AmbientDryAirPotentialTemperature,
    AmbientWaterVapourMixingRatio,
)
from .displacement import (
    SurfacePrecipitation,
    MaxCourantNumber,
    AveragedTerminalVelocity,
    FlowVelocityComponent,
)
from .condensation import (
    PeakSaturation,
    PeakSupersaturation,
    CondensationTimestepMin,
    CondensationTimestepMax,
    ActivatingRate,
    DeactivatingRate,
    RipeningRate,
    ActivableFraction,
)
from .optical import CloudAlbedo, CloudOpticalDepth
from .parcel import ParcelDisplacement, ParcelLiquidWaterPath
