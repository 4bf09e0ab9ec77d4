"""Products (diagnostics) layer — parity targets the reference's ~70 products
(``PySDM/products/``); populated incrementally per SURVEY.md §2.11."""

from .impl import Product, MomentProduct
from .size_spectral import (
    ParticleVolumeVersusRadiusLogarithmSpectrum,
    ParticleSizeSpectrumPerVolume,
    TotalParticleConcentration,
    ParticleConcentration,
    MeanRadius,
    WaterMixingRatio,
    EffectiveRadius,
)
from .housekeeping import (
    WallTime,
    CPUTime,
    SuperDropletCountPerGridbox,
    Time,
)
from .collision import (
    CollisionRatePerGridbox,
    CollisionRateDeficitPerGridbox,
    CoalescenceRatePerGridbox,
)
from .freezing import (
    IceWaterContent,
    SpecificIceWaterContent,
    FrozenParticleConcentration,
    FrozenFraction,
)
from .chemistry import Acidity, AqueousMoleFraction, GaseousMoleFraction
from .ambient_thermodynamics import (
    AmbientTemperature,
    AmbientPressure,
    AmbientRelativeHumidity,
    AmbientDryAirDensity,
    AmbientDryAirPotentialTemperature,
    AmbientWaterVapourMixingRatio,
)
from .displacement import (
    SurfacePrecipitation,
    MaxCourantNumber,
    AveragedTerminalVelocity,
)
from .condensation import (
    PeakSupersaturation,
    CondensationTimestepMin,
    ActivableFraction,
)
