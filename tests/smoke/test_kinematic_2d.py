"""2D kinematic warm-rain smoke test (config #5, the north-star case:
reference ``examples/PySDM_examples/Arabas_et_al_2015`` + the spin-up
regression style of ``tests/smoke_tests/kinematic_2d/arabas_et_al_2015/``).
Scaled down (8x8 grid) to keep CI wall time in check."""

import numpy as np
import pytest

from pysdm_tpu.models.arabas_et_al_2015 import Settings, make_simulation
from pysdm_tpu.physics import Formulae, si


@pytest.fixture(scope="module")
def sim():
    settings = Settings(
        Formulae(seed=13),
        grid=(8, 8),
        size=(1500 * si.m, 1500 * si.m),
        dt=5 * si.s,
        n_sd_per_gridbox=16,
        spin_up_time=5 * si.minute,
    )
    particulator, spin_up = make_simulation(settings)
    return settings, particulator, spin_up


def total_water(p):
    rhod = p.get_env("rhod")
    vapour = float(np.sum(rhod * p.get_env("qv") * p.mesh.dv))
    mult = p.attributes["multiplicity"].astype(float)
    liquid = float(np.sum(mult * p.attributes["water mass"]))
    precip = float(np.sum(p.get_counter("precipitated_mass")))
    return vapour + liquid + precip


def test_spin_up_activates_cloud_deck(sim):
    settings, p, spin_up = sim
    w0 = total_water(p)
    lwc0 = float(np.sum(p.attributes["multiplicity"].astype(float)
                        * p.attributes["water mass"]))
    p.run(settings.n_spin_up)
    p.block_until_ready()
    assert np.asarray(p.get_counter("condensation_success")).all()
    rh = p.get_env("RH").reshape(settings.grid)
    assert np.isfinite(rh).all() and rh.max() < 1.10
    # stratocumulus deck: cloud (RH ~ 1) in the upper part of the domain
    assert rh[:, -3:].max() > 0.99
    assert rh[:, :2].max() < 0.95
    lwc1 = float(np.sum(p.attributes["multiplicity"].astype(float)
                        * p.attributes["water mass"]))
    assert lwc1 > 5 * lwc0, "activation must build liquid water"
    # closed domain during spin-up (no sedimentation): water budget tight
    np.testing.assert_allclose(total_water(p), w0, rtol=1e-3)
    # no precipitation during spin-up
    assert float(np.sum(p.get_counter("precipitated_mass"))) == 0.0


def test_rain_phase_after_spin_up(sim):
    settings, p, spin_up = sim
    spin_up.finish()
    w0 = total_water(p)
    p.run(120)  # 10 min with collisions + sedimentation
    p.block_until_ready()
    assert np.asarray(p.get_counter("condensation_success")).all()
    assert float(np.sum(p.get_counter("coalescence_rate"))) > 0
    # water budget including precipitation stays closed
    np.testing.assert_allclose(total_water(p), w0, rtol=1e-3)
    # droplets grew: largest radius beyond aerosol sizes
    r = p.attributes["radius"]
    alive = p.attributes["multiplicity"] > 0
    assert r[alive].max() > 1 * si.um
