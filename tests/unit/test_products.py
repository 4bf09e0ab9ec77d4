"""Product-layer coverage test: register + read every major product family
on a 1D column (reference analogue: the product sets exercised by
``tests/smoke_tests`` simulations)."""

import numpy as np
import jax.numpy as jnp

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Kinematic1D
from pysdm_tpu.dynamics import AmbientThermodynamics, Condensation, Displacement
from pysdm_tpu.impl.mesh import Mesh
from pysdm_tpu import products as prod
from pysdm_tpu.initialisation import spectra
from pysdm_tpu.initialisation.sampling.spectral_sampling import ConstantMultiplicity
from pysdm_tpu.initialisation.sampling.spatial_sampling import Pseudorandom
from pysdm_tpu.physics import si


def test_product_collection_on_column():
    nz = 16
    mesh = Mesh(grid=(nz,), size=(nz * 50.0,))
    formulae = Formulae(seed=12)
    env = Kinematic1D(
        dt=2 * si.s, mesh=mesh,
        thd_of_z=lambda z: np.full_like(z, 298.0),
        rhod_of_z=lambda z: np.full_like(z, 1.1),
        water_vapour_mixing_ratio_of_z=lambda z: np.full_like(z, 0.016),
    )
    builder = Builder(n_sd=nz * 32, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation(adaptive=True))
    builder.add_dynamic(Displacement(enable_sedimentation=True))
    attributes = env.init_attributes(
        spatial_discretisation=Pseudorandom(),
        spectral_discretisation=ConstantMultiplicity(
            spectra.Lognormal(norm_factor=100 / si.mg, m_mode=0.05 * si.um, s_geom=1.6)
        ),
        kappa=0.9,
        seed=12,
    )
    products = (
        prod.AmbientTemperature(),
        prod.AmbientPressure(),
        prod.AmbientRelativeHumidity(unit="%"),
        prod.AmbientDryAirDensity(),
        prod.AmbientDryAirPotentialTemperature(),
        prod.AmbientWaterVapourMixingRatio(),
        prod.TotalParticleConcentration(),
        prod.ParticleConcentration(radius_range=(1 * si.um, np.inf)),
        prod.MeanRadius(),
        prod.EffectiveRadius(radius_range=(1 * si.um, np.inf)),
        prod.WaterMixingRatio(radius_range=(1 * si.um, np.inf)),
        prod.SuperDropletCountPerGridbox(),
        prod.PeakSupersaturation(),
        prod.CondensationTimestepMin(),
        prod.ActivableFraction(),
        prod.SurfacePrecipitation(),
        prod.MaxCourantNumber(),
        prod.AveragedTerminalVelocity(),
        prod.Time(),
        prod.WallTime(),
        # round-2 coverage: specific/activated/spectral/moment products
        prod.TotalParticleSpecificConcentration(),
        prod.ParticleSpecificConcentration(radius_range=(1 * si.um, np.inf)),
        prod.ActivatedParticleConcentration(
            count_activated=True, count_unactivated=False
        ),
        prod.ActivatedParticleSpecificConcentration(
            count_activated=True, count_unactivated=False
        ),
        prod.ActivatedMeanRadius(count_activated=True, count_unactivated=False),
        prod.ActivatedEffectiveRadius(
            count_activated=True, count_unactivated=False
        ),
        prod.MeanVolumeRadius(),
        prod.NumberSizeSpectrum(radius_bins_edges=np.logspace(-8, -4, 11)),
        prod.ParticleSizeSpectrumPerMassOfDryAir(
            radius_bins_edges=np.logspace(-8, -4, 11)
        ),
        prod.RadiusBinnedNumberAveragedTerminalVelocity(
            radius_bin_edges=np.logspace(-8, -4, 11)
        ),
        prod.RadiusStandardDeviation(),
        prod.AreaStandardDeviation(),
        prod.VolumeStandardDeviation(),
        prod.CloudWaterContent(),
        prod.SpecificCloudWaterContent(),
        prod.LiquidWaterContent(),
        prod.SpecificLiquidWaterContent(),
        prod.ZerothMoment(),
        prod.VolumeFirstMoment(),
        prod.RadiusFirstMoment(),
        prod.CondensationTimestepMax(),
        prod.ActivatingRate(),
        prod.DeactivatingRate(),
        prod.RipeningRate(),
        prod.CoolingRate(),
        prod.FlowVelocityComponent(component=0),
        prod.DynamicWallTime("Condensation"),
    )
    particulator = builder.build(attributes, products=products)
    particulator.sim_state["env"]["courant_0"] = jnp.full(
        nz + 1, 0.1, dtype=particulator.dtype
    )
    # per-dynamic dispatch opt-in: DynamicWallTime must report a real
    # (finite, positive) per-dynamic split, not NaN
    particulator.enable_per_dynamic_timing()
    particulator.run(5)
    for name, product in particulator.products.items():
        value = product.get(**({"S_max": 0.5} if name == "activable fraction" else {}))
        arr = np.asarray(value)
        assert np.isfinite(arr).all(), f"{name}: {arr}"
    # spot checks
    T = particulator.products["T"].get()
    assert (270 < T).all() and (T < 310).all()
    rh = particulator.products["RH"].get()
    assert (rh > 50).all() and (rh < 120).all()
    af = particulator.products["activable fraction"].get(S_max=0.5)
    assert (0 <= af).all() and (af <= 1).all()
    assert particulator.products["time"].get() == 10.0


def test_per_dynamic_timing_mode():
    """opt-in per-dynamic dispatch: DynamicWallTime reports positive wall
    times per dynamic and resets on read; without the opt-in it reports NaN
    (reference dynamic_wall_time.py:9-25 + wall_timer.py)"""
    from pysdm_tpu import Builder, Formulae
    from pysdm_tpu.backends import CPU
    from pysdm_tpu.dynamics import Coalescence
    from pysdm_tpu.dynamics.collisions.collision_kernels import Golovin
    from pysdm_tpu.environments import Box
    from pysdm_tpu.initialisation.sampling.spectral_sampling import (
        ConstantMultiplicity,
    )
    from pysdm_tpu.initialisation.spectra import Exponential

    def build():
        formulae = Formulae(seed=3)
        builder = Builder(
            n_sd=128, backend=CPU(formulae), environment=Box(dv=1e6, dt=1.0)
        )
        builder.add_dynamic(
            Coalescence(collision_kernel=Golovin(b=1.5e3), adaptive=False)
        )
        attributes = {}
        x0 = float(formulae.trivia.volume(radius=30.531e-6))
        attributes["volume"], attributes["multiplicity"] = ConstantMultiplicity(
            Exponential(norm_factor=(2**23) * 1e6, scale=x0)
        ).sample(128)
        return builder.build(
            attributes, products=(prod.DynamicWallTime("Collision"),)
        )

    p = build()
    p.run(3)
    assert np.isnan(float(p.products["Collision wall time"].get()))

    p = build()
    p.enable_per_dynamic_timing()
    p.run(3)
    t1 = float(p.products["Collision wall time"].get())
    assert np.isfinite(t1) and t1 > 0
    # reset-on-read: immediate second read is zero
    assert float(p.products["Collision wall time"].get()) == 0.0
