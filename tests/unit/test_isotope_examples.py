"""Isotope example-family curves (``models/isotopes.py``) — qualitative
checks mirroring the reference's isotope notebook figures."""

import numpy as np

from pysdm_tpu.models import isotopes as m
from pysdm_tpu.physics import si


class TestIsotopeExamples:
    @staticmethod
    def test_equilibrium_fractionation_decreases_with_temperature():
        out = m.equilibrium_fractionation_curves()
        for variant in ("MerlivatAndNief1967", "VanHook1968"):
            alpha = out[variant]["alpha_l_2H"]
            assert (alpha > 1.0).all()  # heavy isotope prefers the liquid
            assert alpha[0] > alpha[-1]  # fractionation weakens when warm

    @staticmethod
    def test_rayleigh_distillation_depletes_vapour():
        out = m.rayleigh_distillation()
        assert out["alpha"] > 1.0
        d = out["delta_vapour"]
        assert d[0] == 0.0
        assert (np.diff(d) < 0).all()  # rain-out progressively depletes
        # precipitation is always heavier than the coexisting vapour
        assert (out["delta_precipitation"] > d).all()

    @staticmethod
    def test_meteoric_water_lines():
        out = m.meteoric_water_lines()
        d18_gmwl = out["Dansgaard1964"]
        # GMWL: d2H = 8 d18O + 10 permil -> d18O = (d2H - 10e-3) / 8
        np.testing.assert_allclose(
            d18_gmwl, (out["delta_2H"] - 10e-3) / 8, rtol=1e-10
        )
        assert not np.allclose(out["PicciottoEtAl1960"], d18_gmwl)

    @staticmethod
    def test_kinetic_fractionation_grows_with_supersaturation():
        out = m.kinetic_fractionation_vs_humidity()
        ak = out["alpha_kinetic"]
        assert ak.shape == out["saturation"].shape
        assert (ak > 0).all()
        # JM84: stronger supersaturation -> stronger kinetic suppression
        assert abs(ak[-1] - 1) < abs(out["alpha_equilibrium"] - 1)
