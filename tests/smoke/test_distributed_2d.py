"""Multi-chip 2D warm-rain smoke test on the emulated 8-device CPU mesh:
the x-slab-decomposed simulation must run the full physics chain with a
closed global water budget and working particle migration."""

import numpy as np
import pytest

from pysdm_tpu.models.arabas_et_al_2015 import Settings
from pysdm_tpu.parallel import DistributedSimulation2D
from pysdm_tpu.physics import Formulae, si

N_DEV = 8


@pytest.fixture(scope="module")
def dist_sim():
    settings = Settings(
        Formulae(seed=17),
        grid=(16, 8),
        size=(1500 * si.m, 1500 * si.m),
        dt=5 * si.s,
        n_sd_per_gridbox=8,
    )
    return settings, DistributedSimulation2D(settings, n_shards=N_DEV)


def total_water(sim):
    p = sim.particulator
    rhod = sim.get_env("rhod")
    vapour = float(np.sum(rhod * sim.get_env("qv") * p.mesh.dv))
    mult = p.attributes["multiplicity"].astype(float)
    liquid = float(np.sum(mult * p.attributes["water mass"]))
    precip = float(np.sum(p.get_counter("precipitated_mass")))
    return vapour + liquid + precip


def test_distributed_step_runs_and_conserves_water(dist_sim):
    settings, sim = dist_sim
    p = sim.particulator
    n_alive0 = int((p.attributes["multiplicity"] > 0).sum())
    w0 = total_water(sim)
    sim.run(24)  # 2 min
    p.block_until_ready()
    assert np.asarray(p.get_counter("condensation_success")).all()
    assert int(np.sum(p.get_counter("migration_dropped"))) == 0
    np.testing.assert_allclose(total_water(sim), w0, rtol=1e-3)
    rh = sim.get_env("RH")
    assert np.isfinite(rh).all() and rh.max() < 1.2
    # particles still tracked (modulo out-of-column deaths)
    n_alive1 = int((p.attributes["multiplicity"] > 0).sum())
    assert n_alive1 > 0.9 * n_alive0


def test_particles_migrate_between_shards(dist_sim):
    settings, sim = dist_sim
    p = sim.particulator
    nxl = settings.grid[0] // N_DEV
    cap = p.particles.n_sd // N_DEV
    shard0 = np.arange(p.particles.n_sd) // cap
    # per-shard alive counts change as the eddy sweeps particles around
    def per_shard_alive():
        alive = np.asarray(p.attributes["multiplicity"]) > 0
        return np.array([alive[shard0 == s].sum() for s in range(N_DEV)])

    before = per_shard_alive()
    sim.run(36)  # 3 more minutes of eddy transport
    p.block_until_ready()
    after = per_shard_alive()
    assert int(np.sum(p.get_counter("migration_dropped"))) == 0
    assert (before != after).any(), "eddy must move particles across slabs"
    # global cell ids remain in range
    gids = sim.global_cell_id()
    alive = np.asarray(p.attributes["multiplicity"]) > 0
    assert gids[alive].min() >= 0
    assert gids[alive].max() < settings.grid[0] * settings.grid[1]
