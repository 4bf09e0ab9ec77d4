"""Smoke tests for Arabas et al. 2025 (singular vs time-dependent immersion
freezing in a cooling box) and Singer & Ward (organic-film Koehler curves)
— reference ``examples/PySDM_examples/<dir>/``."""

import numpy as np
import pytest

from pysdm_tpu.models import arabas_et_al_2025, singer_ward
from pysdm_tpu.physics import si
from pysdm_tpu.physics.formulae import Formulae


DROPLET_VOLUME = float(Formulae().trivia.volume(radius=10 * si.um))
BOX_VOLUME = 1 * si.m**3
TOTAL_PARTICLE_NUMBER = 1e6


def _run(singular, cooling_rate, n_sd=256, seed=44):
    dT_total = arabas_et_al_2025.TEMP_RANGE[0] - arabas_et_al_2025.TEMP_RANGE[1]
    t_total = dT_total / -cooling_rate
    n_steps = 60
    dt = t_total / n_steps
    particulator = arabas_et_al_2025.make_particulator(
        constants=arabas_et_al_2025.FREEZING_CONSTANTS["dust"],
        n_sd=n_sd,
        dt=dt,
        initial_temperature=arabas_et_al_2025.TEMP_RANGE[0],
        singular=singular,
        seed=seed,
        shima_T_fz="Niemand_et_al_2012",
        ABIFM_spec=arabas_et_al_2025.abifm_spec(),
        droplet_volume=DROPLET_VOLUME,
        total_particle_number=TOTAL_PARTICLE_NUMBER,
        volume=BOX_VOLUME,
    )
    profile = lambda t: arabas_et_al_2025.TEMP_RANGE[0] + cooling_rate * t
    out = arabas_et_al_2025.run_simulation(particulator, profile, n_steps)
    ff = arabas_et_al_2025.FrozenFraction(
        volume=BOX_VOLUME,
        droplet_volume=DROPLET_VOLUME,
        total_particle_number=TOTAL_PARTICLE_NUMBER,
        rho_w=particulator.formulae.constants.rho_w,
    )
    frozen_fraction = np.asarray(
        [ff.qi2ff(qi) for qi in out["products"]["qi"]]
    )
    return out, frozen_fraction


class TestArabasEtAl2025:
    def test_singular_frozen_fraction_monotone(self):
        out, ff = _run(singular=True, cooling_rate=-0.75 * si.K / si.min)
        assert ff[0] == 0
        assert (np.diff(ff) >= -1e-12).all()
        # Niemand spectrum with 0.74 um INPs: essentially everything freezes
        # by 230 K
        assert ff[-1] > 0.9

    def test_time_dependent_freezes(self):
        out, ff = _run(singular=False, cooling_rate=-0.75 * si.K / si.min)
        assert ff[0] == 0
        assert ff[-1] > 0.5
        assert (np.diff(ff) >= -1e-12).all()

    def test_cooling_rate_sensitivity(self):
        """the paper's headline: singular frozen fraction at a given T is
        cooling-rate independent, the time-dependent (ABIFM) one freezes
        more at slower cooling (more time at each temperature)"""
        ff_sing = {}
        ff_td = {}
        for rate in (-3.75 * si.K / si.min, -0.15 * si.K / si.min):
            _, ff_sing[rate] = _run(singular=True, cooling_rate=rate)
            _, ff_td[rate] = _run(singular=False, cooling_rate=rate)
        # compare at the mid-profile temperature (same index = same T)
        mid = 30
        fast, slow = -3.75 * si.K / si.min, -0.15 * si.K / si.min
        assert ff_sing[fast][mid] == pytest.approx(
            ff_sing[slow][mid], abs=0.05
        )
        assert ff_td[slow][mid] > ff_td[fast][mid] + 0.05

    def test_frozen_fraction_roundtrip(self):
        ff = arabas_et_al_2025.FrozenFraction(
            volume=BOX_VOLUME,
            droplet_volume=DROPLET_VOLUME,
            total_particle_number=TOTAL_PARTICLE_NUMBER,
            rho_w=1000.0,
        )
        assert ff.qi2ff(ff.ff2qi(0.37)) == pytest.approx(0.37)


class TestSingerWard:
    @pytest.fixture(scope="class")
    def water_molar_volume(self):
        const = Formulae().constants
        return const.Mv / const.rho_w

    def test_aerosol_modes(self, water_molar_volume):
        for cls in singer_ward.AEROSOL_CLASSES:
            aerosol = cls(water_molar_volume=water_molar_volume)
            mode = aerosol.modes[0]
            assert 0 < mode["f_org"] < 1
            for kappa in mode["kappa"].values():
                assert 0 < kappa < 1.5
            # the film models see only the partitioned fraction
            assert (
                mode["kappa"]["CompressedFilmOvadnevaite"]
                < mode["kappa"]["Constant"]
            )
            assert mode["nu_org"] > 0

    def test_kohler_curves(self, water_molar_volume):
        aerosol = singer_ward.AerosolBetaCaryophylleneDark(
            water_molar_volume=water_molar_volume
        )
        curves = {
            st: singer_ward.kohler_curve(
                surface_tension=st, aerosol=aerosol
            )
            for st in ("Constant", "CompressedFilmOvadnevaite")
        }
        for curve in curves.values():
            s = curve["supersaturation"]
            # a Koehler curve: single maximum, tails below it
            i_crit = np.argmax(s)
            assert 0 < i_crit < len(s) - 1
            assert 1e-4 < s[i_crit] < 0.05
        # the organic film lowers surface tension near activation ->
        # lower critical supersaturation than the constant-sigma model
        assert (
            curves["CompressedFilmOvadnevaite"]["supersaturation"].max()
            < curves["Constant"]["supersaturation"].max()
        )
        # film sigma interpolates between organic and pure-water values
        sgm = curves["CompressedFilmOvadnevaite"]["sigma"]
        assert sgm.min() >= 40e-3 - 1e-9
        assert sgm.max() <= 72.9e-3