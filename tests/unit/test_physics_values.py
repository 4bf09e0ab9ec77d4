"""Physics-formula value checks across the variant catalog (reference
analogues: ``tests/unit_tests/physics/test_saturation_vapour_pressure.py``,
``test_air_dynamic_viscosity.py``, ``test_ventilation_coefficient.py``,
``test_terminal_velocity.py`` (dynamics), ``test_thermal_conductivity.py``,
``test_latent_heat.py``, ``test_freezing_temperature_spectra.py``,
``test_optical.py``, ``test_bulk_phase_partitioning.py``) — published-value
anchors plus cross-variant mutual-consistency checks."""

import numpy as np
import pytest

from pysdm_tpu import Formulae
from pysdm_tpu.physics import si

T0C = 273.15

PVS_VARIANTS = (
    "AugustRocheMagnus",
    "Bolton1980",
    "FlatauWalkoCotton",
    "Lowe1977",
    "MurphyKoop2005",
    "Wexler1976",
)


class TestSaturationVapourPressure:
    @staticmethod
    @pytest.mark.parametrize("variant", PVS_VARIANTS)
    def test_value_at_0C(variant):
        f = Formulae(saturation_vapour_pressure=variant)
        pvs = float(f.saturation_vapour_pressure.pvs_water(T0C))
        # 611.2 Pa +- 0.5% across published fits
        np.testing.assert_allclose(pvs, 611.2, rtol=5e-3)

    @staticmethod
    @pytest.mark.parametrize("variant", PVS_VARIANTS)
    @pytest.mark.parametrize("T_C", (-30.0, -10.0, 0.0, 10.0, 25.0, 40.0))
    def test_variants_mutually_consistent(variant, T_C):
        anchor = Formulae(saturation_vapour_pressure="MurphyKoop2005")
        f = Formulae(saturation_vapour_pressure=variant)
        T = T0C + T_C
        got = float(f.saturation_vapour_pressure.pvs_water(T))
        want = float(anchor.saturation_vapour_pressure.pvs_water(T))
        np.testing.assert_allclose(got, want, rtol=2e-2)

    @staticmethod
    @pytest.mark.parametrize(
        "variant", ("FlatauWalkoCotton", "MurphyKoop2005")
    )
    def test_ice_equals_water_at_triple_point_and_below_when_supercooled(
        variant,
    ):
        f = Formulae(saturation_vapour_pressure=variant)
        fam = f.saturation_vapour_pressure
        np.testing.assert_allclose(
            float(fam.pvs_ice(T0C)), float(fam.pvs_water(T0C)), rtol=1e-2
        )
        for T in (T0C - 10, T0C - 25):
            assert float(fam.pvs_ice(T)) < float(fam.pvs_water(T))


def test_air_dynamic_viscosity_zografos():
    f = Formulae()
    # Zografos et al. 1987 polynomial fit: eta(300 K) ~ 1.80e-5 Pa s
    # (the fit sits ~2% below the CRC 1.846e-5 value; the reference test
    # checks against digitized figure data at ~2.4 significant digits)
    eta = float(f.air_dynamic_viscosity.eta_air(300.0))
    np.testing.assert_allclose(eta, 1.80e-5, rtol=1e-2)
    assert float(f.air_dynamic_viscosity.eta_air(350.0)) > eta


class TestVentilation:
    @staticmethod
    def test_neglect_is_unity():
        f = Formulae(ventilation="Neglect")
        x = np.asarray([0.0, 1.0, 10.0])
        np.testing.assert_array_equal(
            np.asarray(f.ventilation.ventilation_coefficient(x)), 1.0
        )

    @staticmethod
    def test_froessling_at_zero_re_is_unity():
        f = Formulae(ventilation="Froessling1938")
        np.testing.assert_allclose(
            float(f.ventilation.ventilation_coefficient(0.0)), 1.0, rtol=1e-6
        )

    @staticmethod
    def test_pruppacher_rasmussen_continuous_at_threshold():
        f = Formulae(ventilation="PruppacherAndRasmussen1979")
        x_thres = f.constants.PRUPPACHER_RASMUSSEN_1979_XTHRES
        eps = 1e-9
        below = float(
            f.ventilation.ventilation_coefficient(x_thres * (1 - eps))
        )
        above = float(
            f.ventilation.ventilation_coefficient(x_thres * (1 + eps))
        )
        # the published piecewise fit is only approximately continuous
        np.testing.assert_allclose(below, above, rtol=1e-3)

    @staticmethod
    def test_monotonic_increasing():
        for variant in ("Froessling1938", "PruppacherAndRasmussen1979"):
            f = Formulae(ventilation=variant)
            x = np.linspace(0.0, 10.0, 100)
            y = np.asarray(f.ventilation.ventilation_coefficient(x))
            assert (np.diff(y) >= 0).all()


class TestTerminalVelocityRogersYau:
    @staticmethod
    def test_regime_values():
        f = Formulae(terminal_velocity="RogersYau")
        # Rogers & Yau 1989: k1 r^2 (Stokes), k2 r (intermediate), k3 sqrt(r)
        v_small = float(f.terminal_velocity.v_term(10e-6))
        np.testing.assert_allclose(v_small, 1.19e8 * (10e-6) ** 2, rtol=0.05)
        v_big = float(f.terminal_velocity.v_term(1e-3))
        np.testing.assert_allclose(v_big, 6.5, rtol=0.15)  # ~6.5 m/s @ 1mm

    @staticmethod
    def test_monotonic():
        f = Formulae(terminal_velocity="RogersYau")
        r = np.geomspace(1e-6, 3e-3, 64)
        v = np.asarray(f.terminal_velocity.v_term(r))
        assert (np.diff(v) > 0).all()


class TestDiffusionThermics:
    @staticmethod
    @pytest.mark.parametrize(
        "variant", ("TracyWelchPorter", "SeinfeldAndPandis2010")
    )
    def test_vapour_diffusivity_standard_conditions(variant):
        f = Formulae(diffusion_thermics=variant)
        D = float(f.diffusion_thermics.D(T0C + 20, 101325.0))
        # water vapour in air at ~20 C, 1 atm: ~2.5e-5 m^2/s
        np.testing.assert_allclose(D, 2.5e-5, rtol=0.1)

    @staticmethod
    def test_thermal_conductivity_standard_conditions():
        f = Formulae(diffusion_thermics="SeinfeldAndPandis2010")
        K = float(f.diffusion_thermics.K(T0C + 20, 101325.0))
        # air at 20 C: ~0.025 W/m/K
        np.testing.assert_allclose(K, 0.025, rtol=0.1)


class TestLatentHeat:
    @staticmethod
    @pytest.mark.parametrize(
        "variant", ("Constant", "Kirchhoff", "SeinfeldPandis")
    )
    def test_about_2p5MJ_at_0C(variant):
        f = Formulae(latent_heat_vapourisation=variant)
        lv = float(f.latent_heat_vapourisation.lv(T0C))
        np.testing.assert_allclose(lv, 2.5e6, rtol=2e-2)

    @staticmethod
    def test_decreases_with_temperature():
        f = Formulae(latent_heat_vapourisation="Kirchhoff")
        assert float(f.latent_heat_vapourisation.lv(T0C + 30)) < float(
            f.latent_heat_vapourisation.lv(T0C)
        )


class TestFreezingTemperatureSpectra:
    @staticmethod
    @pytest.mark.parametrize("variant", ("Niemand_et_al_2012", "Bigg_1953"))
    def test_pdf_normalises_to_one(variant):
        constants = (
            {"NIEMAND_A": -0.517, "NIEMAND_B": 8.934}
            if variant.startswith("Niemand")
            else {"BIGG_DT_MEDIAN": 33.0}  # NaN default, as in the reference
        )
        f = Formulae(
            freezing_temperature_spectrum=variant, constants=constants
        )
        A = 1e-10  # m^2 insoluble surface
        T = np.linspace(T0C - 45, T0C - 0.01, 20_000)
        pdf = np.asarray(f.freezing_temperature_spectrum.pdf(T, A))
        integral = np.trapezoid(pdf, T)
        np.testing.assert_allclose(abs(integral), 1.0, rtol=1e-2)

    @staticmethod
    @pytest.mark.parametrize("variant", ("Niemand_et_al_2012", "Bigg_1953"))
    def test_invcdf_roundtrip(variant):
        constants = (
            {"NIEMAND_A": -0.517, "NIEMAND_B": 8.934}
            if variant.startswith("Niemand")
            else {"BIGG_DT_MEDIAN": 33.0}  # NaN default, as in the reference
        )
        f = Formulae(
            freezing_temperature_spectrum=variant, constants=constants
        )
        A = 1e-10
        cdf_vals = np.asarray([0.05, 0.25, 0.5, 0.75, 0.95])
        T = np.asarray(f.freezing_temperature_spectrum.invcdf(cdf_vals, A))
        assert (T < T0C).all() and (T > 150).all()
        back = np.asarray(f.freezing_temperature_spectrum.cdf(T, A))
        np.testing.assert_allclose(back, cdf_vals, atol=1e-3)


class TestOptical:
    @staticmethod
    def test_stephens_tau_and_bohren_albedo():
        f = Formulae(
            optical_albedo="Bohren1987", optical_depth="Stephens1978"
        )
        LWP = 0.1 * si.kg / si.m**2
        reff = 10 * si.um
        tau = float(f.optical_depth.tau(LWP, reff))
        # tau = 1.5 * LWP / (rho_w reff) = 15
        np.testing.assert_allclose(tau, 15.0, rtol=1e-6)
        albedo = float(f.optical_albedo.albedo(tau))
        assert 0 < albedo < 1
        # thicker cloud -> higher albedo
        assert float(f.optical_albedo.albedo(2 * tau)) > albedo


def test_bulk_phase_partitioning_monotone_liquid_fraction():
    f = Formulae(
        bulk_phase_partitioning="KaulEtAl2015",
        # the exponent has no published default (NaN in the reference too)
        constants={"bulk_phase_partitioning_exponent": 0.2},
    )
    T = np.linspace(T0C - 40, T0C + 5, 64)
    lf = np.asarray(f.bulk_phase_partitioning.liquid_fraction(T))
    assert (lf >= 0).all() and (lf <= 1).all()
    assert (np.diff(lf) >= 0).all()  # warmer -> more liquid
    assert lf[0] < 0.05 and lf[-1] > 0.95
