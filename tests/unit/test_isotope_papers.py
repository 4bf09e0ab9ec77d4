"""Smoke + sanity tests for the per-paper isotope/ventilation formula-study
examples (``pysdm_tpu/models/isotope_papers.py``) and the '+'-composition of
Formulae variants (reference ``PySDM/formulae.py:336-372``)."""

import numpy as np
import pytest

from pysdm_tpu.models import isotope_papers
from pysdm_tpu.physics import si
from pysdm_tpu.physics.formulae import Formulae


def test_formulae_plus_composition():
    f = Formulae(
        isotope_equilibrium_fractionation_factors=(
            "HoritaAndWesolowski1994+BarkanAndLuz2005"
        )
    )
    fam = f.isotope_equilibrium_fractionation_factors
    T = 283.15
    a18 = float(fam.alpha_l_18O(T))
    assert 1.0 < a18 < 1.02
    # 17O comes from the BarkanAndLuz2005 part, parametrized by alpha_l_18O
    a17 = float(fam.alpha_l_17O(np.nan, a18))
    assert 1.0 < a17 < a18


def test_formulae_plus_composition_first_wins():
    """on collisions the earliest listed variant wins (reference MRO
    semantics, ``PySDM/formulae.py:336-372``)"""
    T = 253.15
    merlivat = float(
        Formulae(
            isotope_equilibrium_fractionation_factors="MerlivatAndNief1967"
        ).isotope_equilibrium_fractionation_factors.alpha_i_2H(T)
    )
    composed = float(
        Formulae(
            isotope_equilibrium_fractionation_factors=(
                "MerlivatAndNief1967+EllehojEtAl2013"
            )
        ).isotope_equilibrium_fractionation_factors.alpha_i_2H(T)
    )
    assert composed == merlivat

    with pytest.raises(ValueError, match="unknown variant"):
        Formulae(
            isotope_equilibrium_fractionation_factors="MerlivatAndNief1967+Nope"
        )


def test_bolin_1958_table_1():
    out = isotope_papers.bolin_1958_table_1()
    # larger drops fall faster, ventilate more, adjust slower
    assert (np.diff(out["terminal_velocity"]) > 0).all()
    assert (np.diff(out["ventilation_coefficient"]) > 0).all()
    assert (np.diff(out["adjustment_time"]) > 0).all()
    # Bolin's headline result: seconds (drizzle) to minutes (large rain)
    assert out["adjustment_time"][0] < 5.0
    assert 10.0 < out["adjustment_time"][-1] < 600.0


def test_miyake_et_al_1968_fig_19():
    out = isotope_papers.miyake_et_al_1968_fig_19()
    key_nv = "Neglect-293.15-18O"
    key_fr = "Froessling1938-293.15-18O"
    assert (out[key_fr] >= out[key_nv]).all()  # ventilation speeds relaxation
    assert (np.diff(out[key_nv]) < 0).all()  # bigger drops relax slower


def test_stewart_and_pruppacher_ventilation():
    st = isotope_papers.stewart_1975_fig_1()
    assert (st["ventilation_factor"] >= 0).all()
    pr = isotope_papers.pruppacher_rasmussen_1979_fig_1()
    # heavy-isotope ventilation coefficient is slightly below the light one
    assert (pr["2H"] <= pr["ventilation_coefficient"] + 1e-12).all()
    assert (pr["18O"] <= pr["ventilation_coefficient"] + 1e-12).all()


def test_fisher_1991_fig_2():
    out = isotope_papers.fisher_1991_fig_2()
    assert (out["alpha_eq_2H"] > out["alpha_eq_18O"]).all()
    assert (out["alpha_eff_2H"] > 1).all()


def test_bolot_and_lamb_alphas():
    bl = isotope_papers.bolot_et_al_2013_fig_1()
    # ice-vapour fractionation exceeds liquid-vapour at the same temperature
    m = ~np.isnan(bl["alpha_i_2H"]) & ~np.isnan(bl["alpha_l_2H"])
    assert (bl["alpha_i_2H"][m] > bl["alpha_l_2H"][m]).all()
    lamb = isotope_papers.lamb_et_al_2017_fig_4()
    for paper in ("LambEtAl2017", "EllehojEtAl2013", "MerlivatAndNief1967"):
        assert (lamb[paper] > 1).all()
        assert (np.diff(lamb[paper]) < 0).all()  # alpha decreases with T


def test_graf_et_al_2019_table_1():
    table = isotope_papers.graf_et_al_2019_table_1()
    # condensate is isotopically heavier than the vapour at every temperature
    for row in table.values():
        assert row["diff_delta_18O"] > 0
        assert row["diff_delta_2H"] > 0
    # fractionation strengthens with cooling
    assert table[-10.0]["diff_delta_18O"] > table[20.0]["diff_delta_18O"]


def test_toon_et_al_1980_fig_1():
    out = isotope_papers.toon_et_al_1980_fig_1()
    # lighter gas -> larger scale height -> higher pressure aloft
    assert (out["CH4"][1:] > out["N2"][1:]).all()
    assert (np.diff(out["N2"]) < 0).all()


def test_zaba_et_al_timescales():
    out = isotope_papers.zaba_et_al_timescales()
    for variant in ("MiyakeEtAl1968", "JouzelEtAl1975", "ZabaEtAl"):
        assert (out[variant] > 0).all()
        assert (np.diff(out[variant]) > 0).all()  # tau grows with radius


def test_kinzer_and_gunn_1951_evaporation():
    out = isotope_papers.kinzer_and_gunn_1951_evaporation()
    assert (out["dm_dt"] < 0).all()  # subsaturated: evaporation
    assert (np.diff(-out["dm_dt"]) > 0).all()  # bigger drops lose mass faster


def test_pierchala_et_al_2022_excess_17O():
    out = isotope_papers.pierchala_et_al_2022_excess_17O()
    # residual liquid gets heavier as evaporation proceeds
    assert out["delta_18O"][-1] > out["delta_18O"][0]
    # 17O-excess decreases during evaporation (Pierchala et al. headline)
    assert out["excess_17O"][-1] < out["excess_17O"][0]
