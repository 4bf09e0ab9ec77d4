"""Vapour deposition on ice: frozen particles in an ice-supersaturated
(water-subsaturated) parcel must grow by deposition, depleting vapour and
relaxing the ice saturation ratio toward 1 (reference analogue:
``tests/unit_tests/dynamics/test_vapour_deposition_on_ice.py``)."""

import numpy as np

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Parcel
from pysdm_tpu.dynamics import AmbientThermodynamics, VapourDepositionOnIce
from pysdm_tpu.physics import si


def test_deposition_grows_ice_and_depletes_vapour():
    n_sd = 64
    formulae = Formulae(
        seed=5,
        particle_shape_and_density="MixedPhaseSpheres",
    )
    T0 = 255.0 * si.K
    # RH_water ~ 0.9 at 255 K is strongly ice-supersaturated
    pvs_w = float(formulae.saturation_vapour_pressure.pvs_water(T0))
    pvs_i = float(formulae.saturation_vapour_pressure.pvs_ice(T0))
    p0 = 600 * si.hPa
    RH_w = 0.9
    qv0 = formulae.constants.eps * RH_w * pvs_w / (p0 - RH_w * pvs_w)
    env = Parcel(
        dt=1 * si.s,
        mass_of_dry_air=1e3 * si.kg,
        p0=p0,
        initial_water_vapour_mixing_ratio=float(qv0),
        T0=T0,
        w=0.0,
    )
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(VapourDepositionOnIce())
    ice_mass0 = 1e-10  # ~ 60 um ice sphere
    attributes = {
        "multiplicity": np.full(n_sd, 1e6),
        "signed water mass": np.full(n_sd, -ice_mass0),
    }
    particulator = builder.build(attributes)

    S_ice0 = float(env["RH"][0]) * pvs_w / pvs_i
    assert S_ice0 > 1.05
    qv_start = float(env["qv"][0])

    particulator.run(100)
    particulator.block_until_ready()

    signed = np.asarray(particulator.attributes["signed water mass"])
    assert (signed < 0).all(), "particles stay frozen"
    assert (-signed > ice_mass0).all(), "ice grew by deposition"
    assert float(env["qv"][0]) < qv_start, "vapour consumed"
    # mass budget: ice growth == vapour loss * dry-air mass
    ice_gain = float(np.sum((-signed - ice_mass0) * 1e6))
    vapour_loss = (qv_start - float(env["qv"][0])) * 1e3
    np.testing.assert_allclose(ice_gain, vapour_loss, rtol=2e-2)
    # saturation ratio relaxes toward (but not below) ice saturation
    T1 = float(env["T"][0])
    S_ice1 = (
        float(env["RH"][0])
        * float(formulae.saturation_vapour_pressure.pvs_water(T1))
        / float(formulae.saturation_vapour_pressure.pvs_ice(T1))
    )
    assert 1.0 <= S_ice1 < S_ice0


def test_tiny_fresh_crystal_log_coordinate_stays_finite():
    """regression: with the WaterMassLogarithm coordinate, a freshly
    nucleated sub-picogram crystal's explicit-Euler mass can overflow
    exp() to inf; the per-drop vapour cap must keep dm finite instead of
    the budget limiter producing inf * 0 = NaN (observed in the Abade &
    Albuquerque glaciation run)"""
    n_sd = 8
    formulae = Formulae(
        seed=5,
        particle_shape_and_density="MixedPhaseSpheres",
        diffusion_coordinate="WaterMassLogarithm",
    )
    T0 = 240.0 * si.K
    pvs_w = float(formulae.saturation_vapour_pressure.pvs_water(T0))
    p0 = 500 * si.hPa
    RH_w = 1.0
    qv0 = formulae.constants.eps * RH_w * pvs_w / (p0 - RH_w * pvs_w)
    env = Parcel(
        dt=100.0 * si.s,  # huge dt -> huge dx in the log coordinate
        mass_of_dry_air=1e3 * si.kg,
        p0=p0,
        initial_water_vapour_mixing_ratio=float(qv0),
        T0=T0,
        w=0.0,
    )
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(VapourDepositionOnIce())
    attributes = {
        "multiplicity": np.full(n_sd, 1e6),
        # femtogram crystals: dx/dt = dm_dt/m is enormous
        "signed water mass": np.full(n_sd, -1e-18),
    }
    particulator = builder.build(attributes)
    qv_start = float(env["qv"][0])
    particulator.run(3)
    particulator.block_until_ready()

    signed = np.asarray(particulator.attributes["signed water mass"])
    assert np.isfinite(signed).all()
    qv1 = float(env["qv"][0])
    assert np.isfinite(qv1) and 0.0 <= qv1 <= qv_start
    assert np.isfinite(float(env["T"][0]))
