"""Paper-figure-level smoke tests for the second batch of isotope paper
reproductions (Merlivat & Nief 1967, Van Hook 1968, Gonfiantini 1986,
Jouzel & Merlivat 1984, Gedzelman & Arnold 1994, Rozanski & Sonntag 1982 —
reference ``examples/PySDM_examples/<dir>/``)."""

import numpy as np
import pytest

from pysdm_tpu.models import (
    gedzelman_and_arnold_1994,
    gonfiantini_1986,
    jouzel_and_merlivat_1984,
    merlivat_and_nief_1967,
    rozanski_and_sonntag_1982,
    van_hook_1968,
)
from pysdm_tpu.physics import si
from pysdm_tpu.physics.constants import PER_MILLE
from pysdm_tpu.physics.formulae import Formulae


class TestMerlivatAndNief1967:
    def test_fig_2(self):
        out = merlivat_and_nief_1967.fig_2()
        # the plotted window of the paper's fig. 2
        for curve in ("liquid", "ice"):
            assert (out[curve]["x"] > 11).all() and (out[curve]["x"] < 20).all()
            assert (out[curve]["y"] > 30).all() and (out[curve]["y"] < 90).all()
            # log alpha grows with 1/T^2 (colder -> stronger fractionation)
            assert (np.diff(out[curve]["y"]) > 0).all()
        # vapour-ice fractionation exceeds vapour-liquid at the same T:
        # compare at 0C (liquid idx where T_C==0 vs ice idx 0)
        i_liq = np.argmin(np.abs(out["liquid"]["T_C"]))
        assert out["ice"]["y"][0] > out["liquid"]["y"][i_liq]


class TestVanHook1968:
    def test_fig_1_ordering(self):
        out = van_hook_1968.fig_1()
        # heavier isotopologues fractionate more: TOT > DOT > DOD > 3H > 2H
        # >> 18O > 17O (paper fig. 1 line ordering), compare ln(alpha_l) at
        # the common 1e3/T = 3.6 point
        y = {
            iso: np.interp(3.6, *out[iso]["liquid"])
            for iso in van_hook_1968.ISOTOPOLOGUES
        }
        assert (
            y["TOT"] > y["DOT"] > y["DOD"] > y["3H"] > y["2H"] > y["18O"]
            > y["17O"] > 0
        )

    def test_ice_stronger_than_liquid(self):
        out = van_hook_1968.fig_1()
        for iso in van_hook_1968.ISOTOPOLOGUES:
            y_l = np.interp(3.7, *out[iso]["liquid"])
            y_i = np.interp(3.7, *out[iso]["ice"])
            assert y_i > y_l

    def test_against_tabulated(self):
        """alpha_l_2H at 0C from the Table-V polynomial ~ 1.12 (paper)"""
        f = Formulae(isotope_equilibrium_fractionation_factors="VanHook1968")
        alpha = float(
            f.isotope_equilibrium_fractionation_factors.alpha_l_2H(273.15)
        )
        assert 1.10 < alpha < 1.14


class TestGonfiantini1986:
    def test_fig_3_1(self):
        out = gonfiantini_1986.fig_3_1()
        remaining = out["remaining_water_fraction"]
        for isotope in ("2H", "18O"):
            # at zero ambient humidity: pure Rayleigh -> monotonic unbounded
            # enrichment of the remaining liquid
            d_h0 = out[isotope][0]
            assert (np.diff(d_h0) > 0).all()
            assert d_h0[-1] > d_h0[0]
            # at high humidity, exchange with ambient vapour bounds the
            # enrichment: delta at f->0 stays finite and *below* the dry case
            d_h95 = out[isotope][0.95]
            assert d_h95[-1] < d_h0[-1]
        # fig. 3.1 reading: 18O enrichment at h=0.5, f=0.1 is ~+25..45 permil
        i_f01 = np.argmin(np.abs(remaining - 0.1))
        assert 15 * PER_MILLE < out["18O"][0.5][i_f01] < 50 * PER_MILLE


class TestJouzelAndMerlivat1984:
    def test_fig_8(self):
        out = jouzel_and_merlivat_1984.fig_8()
        # liquid-saturation wrt ice grows as it gets colder and exceeds 1
        assert (np.diff(out["saturation_wrt_liquid"]) > 0).all()
        assert out["saturation_wrt_liquid"][0] == pytest.approx(1, abs=5e-3)
        # curve 4 (the assumed in-cloud ice saturation) lies between ice
        # saturation (Si=1) and liquid saturation over the plotted -10..-50C
        # range, increasing as it gets colder (fig. 8)
        sel = out["T_C"] <= -10
        assert (out["curve_4"][sel] > 1).all()
        assert (out["curve_4"][sel] < out["saturation_wrt_liquid"][sel]).all()
        assert (np.diff(out["curve_4"]) > 0).all()

    def test_fig_9(self):
        out = jouzel_and_merlivat_1984.fig_9()
        for T_C in (-10.0, -20.0, -30.0):
            # kinetic effect: effective fractionation decreases with Si
            assert (np.diff(out[T_C]) < 0).all()
            # alpha_s*alpha_k stays above 1 over the plotted Si range
            assert (out[T_C] > 1).all()
        # colder -> larger equilibrium fractionation at Si=1
        assert out[-30.0][0] > out[-20.0][0] > out[-10.0][0]

    def test_thermodynamic_profile(self):
        f = Formulae()
        T = f.constants.T0 - 20
        qv = jouzel_and_merlivat_1984.vapour_mixing_ratio(f, T)
        # ~1 g/kg vapour at -20C/780mb under slight ice-subsaturation
        assert 0.5 * si.g / si.kg < qv < 2 * si.g / si.kg
        assert np.isnan(jouzel_and_merlivat_1984.pressure(f.constants.T0 + 5))


class TestGedzelmanAndArnold1994:
    def test_fig_2(self):
        out = gedzelman_and_arnold_1994.fig_2()
        x = out["rain_ratio_over_vsmow"]
        s_rain = out["S_rain_eq_22"]
        s_vap = out["S_vapour_eq_23"]
        # the two equilibrium curves intersect where rain and vapour are in
        # isotopic equilibrium: R_rain = alpha * R_v
        cmn = out["commons"]
        x_eq = cmn.alpha_w * cmn.iso_ratio_v / cmn.vsmow_ratio
        i_eq = np.argmin(np.abs(x - x_eq * 1.0001))
        assert abs(s_rain[i_eq] - s_vap[i_eq]) < 0.05
        # at the equilibrium ratio both curves sit at saturation (S=1)
        assert s_rain[i_eq] == pytest.approx(1.0, abs=0.05)
        # S_R decreases with increasing rain ratio (paper fig. 2 shape)
        sel = (x > x_eq * 1.01) & (x < 1.0)
        assert (np.diff(s_rain[sel]) < 0).all()


class TestRozanskiAndSonntag1982:
    @pytest.fixture(scope="class")
    def output(self):
        settings = rozanski_and_sonntag_1982.Settings()
        multibox = rozanski_and_sonntag_1982.MultiBox(settings)
        return settings, multibox, multibox.run()

    def test_parcel_profile(self, output):
        settings, multibox, _ = output
        profiles = multibox.profiles
        # ascent from 25C/80%RH: saturation reached, then moist-adiabatic
        # cooling to below freezing near 7.2 km (paper fig. 4 left panel)
        assert profiles["RH"][0] == pytest.approx(0.8, abs=0.02)
        assert profiles["RH"].max() > 0.99
        assert profiles["T"][0] - profiles["T"][-1] > 40
        # rain forms: cloud water capped at the autoconversion threshold
        assert multibox.QR[-1] > 5 * si.g / si.kg

    def test_rayleigh_depletion_with_altitude(self, output):
        settings, _, out = output
        const = settings.formulae.constants
        trivia = settings.formulae.trivia
        # iteration 0 = pure Rayleigh: vapour delta-2H decreases with height
        d2H = np.asarray(
            trivia.isotopic_ratio_2_delta(out[0]["Rv_2H"], const.VSMOW_R_2H)
        )
        assert d2H[-1] < d2H[len(d2H) // 2] < d2H[0]
        # order of magnitude at cloud top (fig. 5: few hundred permil)
        assert -600 * PER_MILLE < d2H[-1] < -100 * PER_MILLE

    def test_exchange_converges_and_depletes_rain(self, output):
        settings, _, out = output
        const = settings.formulae.constants
        trivia = settings.formulae.trivia
        cb = 3  # a few levels above ground ~ cloud base
        rain_d2H = [
            float(
                trivia.isotopic_ratio_2_delta(
                    it["Rr_2H"][cb], const.VSMOW_R_2H
                )
            )
            for it in out
        ]
        # rain-vapour exchange progressively depletes cloud-base rain
        # (fig. 5: from near 0 permil toward ~ -20 permil at iteration 400)
        assert rain_d2H[-1] < rain_d2H[1] - 5 * 1e-3
        assert -30e-3 < rain_d2H[-1] < -5e-3
        # fixed point reached: the last sweeps barely move
        assert abs(rain_d2H[-1] - rain_d2H[-2]) < 0.05 * abs(
            rain_d2H[-1] - rain_d2H[1]
        )
