"""Isotope physics tests (reference analogue: ``tests/unit_tests/physics/
test_isotope_*``): fractionation-factor magnitudes, diffusivity ratios,
meteoric-water-line identities, delta attribute round trip."""

import numpy as np
import jax.numpy as jnp

from pysdm_tpu import Formulae


def test_equilibrium_fractionation_factors_sane():
    f = Formulae(
        isotope_equilibrium_fractionation_factors="HoritaAndWesolowski1994",
    )
    T = jnp.asarray([273.15, 293.15, 313.15])
    a18 = np.asarray(f.isotope_equilibrium_fractionation_factors.alpha_l_18O(T))
    a2 = np.asarray(f.isotope_equilibrium_fractionation_factors.alpha_l_2H(T))
    # heavy isotopes prefer the liquid: alpha > 1, decreasing with T
    assert (a18 > 1).all() and (np.diff(a18) < 0).all()
    assert (a2 > 1).all() and (np.diff(a2) < 0).all()
    # known magnitudes: alpha_18O(20C) ~ 1.0098, alpha_2H(20C) ~ 1.085
    np.testing.assert_allclose(a18[1], 1.0098, atol=5e-4)
    np.testing.assert_allclose(a2[1], 1.085, atol=5e-3)


def test_majoube_1971_at_0C():
    f = Formulae(isotope_equilibrium_fractionation_factors="Majoube1971")
    a18 = float(f.isotope_equilibrium_fractionation_factors.alpha_l_18O(
        jnp.asarray(273.15)))
    np.testing.assert_allclose(a18, 1.0117, atol=5e-4)


def test_diffusivity_ratios():
    for variant, expected_2H in (
        ("Stewart1975", 0.984),
        ("HellmannAndHarvey2020", 0.9755),
    ):
        f = Formulae(isotope_diffusivity_ratios=variant)
        r = float(f.isotope_diffusivity_ratios.ratio_2H_heavy_to_light(
            jnp.asarray(293.15)))
        assert 0.95 < r < 1.0, f"{variant}: {r}"
        np.testing.assert_allclose(r, expected_2H, atol=5e-3)


def test_meteoric_water_line_roundtrip():
    f = Formulae(isotope_meteoric_water_line="Dansgaard1964")
    d18O = -10e-3
    d2H = float(f.constants.CRAIG_1961_SLOPE_COEFF) * d18O + float(
        f.constants.CRAIG_1961_INTERCEPT_COEFF
    )
    excess = float(f.isotope_meteoric_water_line.excess_d(
        jnp.asarray(d2H), jnp.asarray(d18O)))
    np.testing.assert_allclose(excess, float(f.constants.CRAIG_1961_INTERCEPT_COEFF))


def test_rayleigh_distillation():
    f = Formulae(isotope_ratio_evolution="RayleighDistillation")
    out = float(f.isotope_ratio_evolution.R_over_R0(jnp.asarray(0.5), 1.01))
    np.testing.assert_allclose(out, 0.5 ** 0.01)


def test_delta_attribute_roundtrip():
    import numpy as np
    from pysdm_tpu import Builder
    from pysdm_tpu.backends import CPU
    from pysdm_tpu.environments import Box
    from pysdm_tpu.physics import si

    f = Formulae(seed=3)
    const = f.constants
    n_sd = 4
    builder = Builder(n_sd=n_sd, backend=CPU(f),
                      environment=Box(dt=1 * si.s, dv=1 * si.m**3))
    delta_in = np.asarray([-0.1, -0.05, 0.0, 0.1])
    moles_1H = np.full(n_sd, 1.0)
    ratio = (1 + delta_in) * const.VSMOW_R_2H
    attributes = {
        "multiplicity": np.ones(n_sd),
        "water mass": np.full(n_sd, 1e-12),
        "moles_1H": moles_1H,
        "moles_2H": ratio * moles_1H,
    }
    p = builder.build(attributes)
    np.testing.assert_allclose(p.attributes["delta_2H"], delta_in, rtol=1e-12)
