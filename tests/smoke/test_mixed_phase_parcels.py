"""Smoke tests for the mixed-phase parcel papers: Spichtinger et al. 2023
(cirrus by homogeneous freezing) and Abade & Albuquerque 2024 (immersion
freezing + deposition, Wegener-Bergeron-Findeisen glaciation) — reference
``examples/PySDM_examples/<dir>/``."""

import numpy as np
import pytest

from pysdm_tpu.models import (
    abade_and_albuquerque_2024,
    spichtinger_et_al_2023,
)


class TestSpichtingerEtAl2023:
    @pytest.fixture(scope="class")
    def output(self):
        settings = spichtinger_et_al_2023.Settings(
            n_sd=32, w_updraft=5.0, T0=220.0, seed=44, dt=1.0
        )
        sim = spichtinger_et_al_2023.Simulation(settings)
        return settings, sim, sim.run(n_steps=400, steps_per_output=20)

    def test_homogeneous_nucleation_burst(self, output):
        settings, _, out = output
        # RH_ice rises from exactly 1 to the homogeneous-freezing threshold
        # (~1.45-1.6 at 215 K, paper fig. B1), then collapses as the
        # nucleated ice consumes the vapour
        assert out["RH_ice"][0] == pytest.approx(1.0, abs=1e-6)
        assert 1.4 < np.nanmax(out["RH_ice"]) < 1.7
        assert out["RH_ice"][-1] < 1.1
        # an ice-crystal burst appears and persists
        assert out["n_i"][0] == 0
        assert out["n_i"][-1] > 1e6  # per m^3
        # nucleated concentration bounded by the solution-droplet reservoir
        n_max = settings.N_dv_solution_droplet
        assert out["n_i"][-1] <= n_max * 1.01

    def test_ice_growth_and_budget(self, output):
        settings, sim, out = output
        assert (np.diff(out["qi"][out["qi"] > 0]) >= -1e-18).all()
        assert out["qi"][-1] > 0
        # water budget: qv + all condensed water per dry-air mass equals the
        # initial total within 0.1% despite the nucleation burst and the
        # deposition limiter engaging (the limiter's vapour feedback uses
        # the same limited mass increment, so the budget closes)
        p = sim.particulator
        sm = np.asarray(p.particles.ext("signed water mass"))
        mult = np.asarray(p.particles.multiplicity)
        qv = float(p.get_env("qv")[0])
        md = settings.mass_of_dry_air
        total = qv + float((mult * np.abs(sm)).sum()) / md
        # initial condensed (haze) water is < 0.1% of the vapour
        assert total == pytest.approx(
            settings.initial_water_vapour_mixing_ratio, rel=1e-3
        )


class TestAbadeAndAlbuquerque2024:
    @pytest.fixture(scope="class")
    def output(self):
        settings = abade_and_albuquerque_2024.Settings(
            n_sd=64, timestep=10.0, seed=44
        )
        sim = abade_and_albuquerque_2024.Simulation(settings)
        out = sim.run(nt=700, steps_per_output_interval=50)["products"]
        return settings, sim, out

    def test_cloud_then_glaciation(self, output):
        _, _, out = output
        water, ice = out["water"], out["ice"]
        # liquid cloud forms on ascent...
        assert water[0] < 1e-8
        assert water.max() > 1e-4
        # ...then immersion freezing + deposition glaciate it (WBF):
        assert ice[np.argmax(water)] < ice[-1]
        assert ice[-1] > 1e-3
        assert water[-1] < 1e-6
        # vapour depleted by the growing ice
        assert out["vapour"][-1] < 0.3 * out["vapour"][0]

    def test_freezing_onset_temperature(self, output):
        _, _, out = output
        # Niemand-spectrum INPs activate between ~ -15 and -30 C
        first_ice = np.argmax(out["ice"] > 0)
        T_onset = out["T"][first_ice]
        assert 238 < T_onset < 260

    def test_toggles(self):
        settings = abade_and_albuquerque_2024.Settings(
            n_sd=16,
            timestep=10.0,
            enable_immersion_freezing=False,
            enable_vapour_deposition_on_ice=False,
        )
        sim = abade_and_albuquerque_2024.Simulation(settings)
        out = sim.run(nt=50, steps_per_output_interval=25)["products"]
        assert (out["ice"] == 0).all()
