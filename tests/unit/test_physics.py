"""Physics formula checks against literature values (model: reference
``tests/unit_tests/physics/``; values independent of the reference's code)."""

import numpy as np
import pytest

from pysdm_tpu import Formulae
from pysdm_tpu.physics import si


class TestSaturationVapourPressure:
    @staticmethod
    @pytest.mark.parametrize(
        "variant, T, expected, tol",
        (
            # triple-point saturation pressure ~611.7 Pa (CIPM / Guide values)
            ("FlatauWalkoCotton", 273.16, 611.7, 2.0),
            ("AugustRocheMagnus", 273.16, 611.7, 5.0),
            ("Bolton1980", 273.16, 611.7, 2.0),
            ("MurphyKoop2005", 273.16, 611.7, 2.0),
            ("Wexler1976", 273.16, 611.7, 2.0),
            # ~3167 Pa at 25 C (CRC handbook: 3.1699 kPa)
            ("FlatauWalkoCotton", 298.15, 3170.0, 10.0),
            ("MurphyKoop2005", 298.15, 3170.0, 10.0),
        ),
    )
    def test_pvs_water(variant, T, expected, tol):
        f = Formulae(saturation_vapour_pressure=variant)
        pvs = float(f.saturation_vapour_pressure.pvs_water(T))
        assert abs(pvs - expected) < tol

    @staticmethod
    def test_ice_below_water_in_supercooled_regime():
        f = Formulae(saturation_vapour_pressure="FlatauWalkoCotton")
        T = 253.15
        assert float(f.saturation_vapour_pressure.pvs_ice(T)) < float(
            f.saturation_vapour_pressure.pvs_water(T)
        )


class TestTrivia:
    @staticmethod
    def test_volume_radius_roundtrip():
        f = Formulae()
        r = 30.531 * si.um
        v = float(f.trivia.volume(radius=r))
        assert abs(v - 4 / 3 * np.pi * r**3) < 1e-25
        assert abs(float(f.trivia.radius(volume=v)) - r) < 1e-12

    @staticmethod
    def test_th_std():
        f = Formulae()
        # potential temperature at p = p1000 equals T
        assert abs(float(f.trivia.th_std(p=1000 * si.hPa, T=300.0)) - 300.0) < 1e-10


class TestLatentHeat:
    @staticmethod
    def test_lv_at_0C_about_2p5MJ():
        f = Formulae()
        lv = float(f.latent_heat_vapourisation.lv(273.15))
        assert abs(lv - 2.50e6) < 0.02e6


class TestParticleShapeAndDensity:
    @staticmethod
    def test_mass_volume_roundtrip():
        f = Formulae()
        m = 1e-12  # kg
        v = float(f.particle_shape_and_density.mass_to_volume(m))
        assert abs(v - m / 1000.0) < 1e-18  # rho_w = 1000 kg/m3
        assert abs(float(f.particle_shape_and_density.volume_to_mass(v)) - m) < 1e-18


class TestHygroscopicity:
    @staticmethod
    def test_kappa_koehler_critical_supersaturation_small():
        """equilibrium saturation ratio at large wet radius tends to 1"""
        f = Formulae(hygroscopicity="KappaKoehler")
        rw3 = (50 * si.um) ** 3
        rd3 = (0.1 * si.um) ** 3
        RH_eq = float(
            f.hygroscopicity.RH_eq(
                50 * si.um, T=300.0, kp=0.5, rd3=rd3, sgm=0.072
            )
        )
        assert abs(RH_eq - 1.0) < 1e-3


class TestConstants:
    @staticmethod
    def test_override():
        f = Formulae(constants={"rho_w": 999.0})
        assert f.constants.rho_w == 999.0

    @staticmethod
    def test_unknown_rejected():
        with pytest.raises((ValueError, KeyError)):
            Formulae(constants={"no_such_constant_xyz": 1.0})
