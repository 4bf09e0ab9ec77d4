"""Smoke tests for Morrison & Grabowski 2007 (strato-cumulus 2D kinematic
base + mixed-phase toggle), Rogers 1975 (supersaturation ODE) and Ervens &
Feingold 2012 (CCN spectrum) — reference
``examples/PySDM_examples/<dir>/``."""

import numpy as np
import pytest

from pysdm_tpu.models import (
    ervens_and_feingold_2012,
    morrison_and_grabowski_2007,
    rogers_1975,
)
from pysdm_tpu.physics import Formulae, si


class TestRogers1975:
    def test_fig_1(self):
        out = rogers_1975.fig_1()
        s_pct = out["supersaturation"] * 100
        r_um = out["radius"] / si.um
        # fig. 1 frame: supersaturation stays within 0..1.1 %, radius grows
        # monotonically from 8 to ~10 um over the 20 s window
        assert (s_pct[1:] > 0).all() and s_pct.max() < 1.1
        assert (np.diff(r_um) > 0).all()
        assert r_um[0] == pytest.approx(8.0, abs=0.05)
        assert 9.5 < r_um[-1] < 10.2
        # the supersaturation peaks mid-window then relaxes (quasi-steady)
        i_peak = np.argmax(s_pct)
        assert 0 < i_peak < len(s_pct) - 1
        assert s_pct[-1] < s_pct[i_peak]
        # parcel cools and decompresses while rising at 10 m/s
        assert out["temperature"][-1] < out["temperature"][0]
        assert out["pressure"][-1] < out["pressure"][0]


class TestErvensAndFeingold2012:
    def test_spectrum(self):
        # Niedermeier-2014 window: captures >99% of the lognormal
        diameters, concentrations = (
            ervens_and_feingold_2012
            .sampled_ccn_diameter_number_concentration_spectrum(
                size_range=(10 * si.nm, 353 * si.nm)
            )
        )
        assert len(diameters) == len(concentrations) == 11
        assert (np.diff(diameters) > 0).all()
        total = concentrations.sum() * si.cm**3
        assert 99 < total < 101

    def test_default_window_trips_number_error_guard(self):
        # the (0.02, 2) um default window cuts ~2% of the distribution:
        # the deterministic-sampling 1%-error guard fires (same guard as
        # reference ``spectral_sampling.py:48-60``)
        with pytest.raises(ValueError, match="error in total real-droplet"):
            (
                ervens_and_feingold_2012
                .sampled_ccn_diameter_number_concentration_spectrum()
            )


class TestMorrisonAndGrabowski2007:
    def test_velocity_field(self):
        settings = morrison_and_grabowski_2007.StratoCumulus(
            Formulae(),
            rhod_w_max=1 * si.m / si.s * si.kg / si.m**3,
            grid=(16, 16),
            size=(2 * si.km, 1 * si.km),
            dt=1 * si.s,
        )
        out = morrison_and_grabowski_2007.velocity_field(settings)
        # fig. 1 levels reach +/-1.5 m/s: w_max = 2*rhod_w_max/rhod ~ 1.7,
        # u_max = rhod_w_max*X/Z/rhod ~ 2.2 for the 2x1 km domain
        assert 1.4 < np.abs(out["w"]).max() < 2.0
        assert 1.5 < np.abs(out["u"]).max() < 3.0
        # z-velocity vanishes at the bottom and top boundaries
        assert np.abs(out["w"][:, 0]).max() < 1e-12
        assert np.abs(out["w"][:, -1]).max() < 1e-12

    def test_mixed_phase_simulation(self):
        settings = morrison_and_grabowski_2007.StratoCumulus(
            Formulae(
                seed=44,
                freezing_temperature_spectrum="Bigg_1953",
                particle_shape_and_density="MixedPhaseSpheres",
            ),
            rhod_w_max=1 * si.m / si.s * si.kg / si.m**3,
            grid=(6, 6),
            size=(1.5 * si.km, 1.5 * si.km),
            dt=5 * si.s,
            n_sd_per_gridbox=8,
            spin_up_time=0,
        )
        settings.processes["freezing"] = True
        particulator, _ = morrison_and_grabowski_2007.make_simulation(
            settings
        )
        assert "Freezing" in particulator.dynamics
        assert "freezing temperature" in particulator.attributes
        mass0 = float(
            (
                particulator.attributes["multiplicity"]
                * np.abs(particulator.attributes["signed water mass"])
            ).sum()
        )
        particulator.run(3)
        particulator.block_until_ready()
        # warm strato-cumulus: nothing freezes at ~289 K, water evolves
        # (condensation active), everything stays finite
        signed = np.asarray(particulator.attributes["signed water mass"])
        assert np.isfinite(signed).all()
        assert (signed > 0).all()  # no ice at these temperatures
        mass1 = float(
            (particulator.attributes["multiplicity"] * np.abs(signed)).sum()
        )
        assert mass1 != mass0

    def test_warm_path_delegates_to_arabas(self):
        settings = morrison_and_grabowski_2007.StratoCumulus(
            Formulae(seed=44),
            rhod_w_max=0.6 * si.m / si.s * si.kg / si.m**3,
            grid=(4, 4),
            size=(1.5 * si.km, 1.5 * si.km),
            dt=5 * si.s,
            n_sd_per_gridbox=4,
            spin_up_time=0,
        )
        particulator, _ = morrison_and_grabowski_2007.make_simulation(
            settings
        )
        assert "Freezing" not in particulator.dynamics
        particulator.run(2)
        assert np.isfinite(
            np.asarray(particulator.attributes["water mass"])
        ).all()
