"""Shard-count invariance verification: the distributed decomposition must
compute the SAME physics as a single device.

With collisions disabled, every dynamic in the 2D kinematic chain is
deterministic (condensation, MPDATA advection, displacement/sedimentation,
migration), so the global state after N steps must agree between
decompositions up to float reassociation — the strongest multi-chip
correctness statement obtainable without equalizing stochastic collision
streams across containers. This is the repo's analogue of the reference's
CPU-vs-GPU backend parametrization of every unit test
(reference ``tests/unit_tests/conftest.py:8-16``).

Particles are matched across runs by their DRY VOLUME — conserved, constant
in time when collisions are off, and pairwise-distinct under the continuous
spectral sampling — so container layout (shard blocks, capacity padding,
sort order) cannot confound the comparison.
"""

import numpy as np

from ..physics import Formulae


def _build(settings_factory, n_shards, backend_class):
    from .distributed_2d import DistributedSimulation2D

    settings = settings_factory()
    sim = DistributedSimulation2D(settings, n_shards=n_shards,
                                  backend_class=backend_class)
    sim.particulator.set_flag("collision_enable", False)
    return settings, sim


def canonical_particles(sim, settings):
    """per-alive-particle rows [dry_volume, global_x, global_z, water_mass,
    multiplicity], ordered by dry volume (the decomposition-independent
    identity key)"""
    p = sim.particulator
    nx, nz = settings.grid
    sx, sz = getattr(sim, "mesh_shape", (sim.n_shards, 1))
    nxl = nx // sx
    nzl = nz // sz
    mult = np.asarray(p.particles.multiplicity, dtype=np.float64)
    n_local = mult.shape[0] // sim.n_shards
    shard = np.arange(mult.shape[0]) // n_local
    origin = np.asarray(p.particles.cell_origin, dtype=np.float64)
    pic = np.asarray(p.particles.position_in_cell, dtype=np.float64)
    gx = origin[0] + (shard // sz) * nxl + pic[0]
    gz = origin[1] + (shard % sz) * nzl + pic[1]
    dv_dry = np.asarray(p.particles.ext("dry volume"), dtype=np.float64)
    wm = np.asarray(p.particles.ext("signed water mass"), dtype=np.float64)
    alive = mult > 0
    rows = np.stack(
        [dv_dry[alive], gx[alive], gz[alive], wm[alive], mult[alive]], axis=1
    )
    return rows[np.argsort(rows[:, 0], kind="stable")]


def shard_invariance_report(
    settings_factory, shard_counts, steps, backend_class=None,
    fields=("thd", "qv", "RH"),
):
    """run the deterministic (collision-disabled) distributed case at each
    shard count and compare global state against the first count. Returns a
    dict of max relative differences; raises AssertionError on mismatch of
    alive counts or lost particles."""
    if backend_class is None:
        from ..backends import CPU as backend_class  # noqa: N813

    report = {}
    ref_settings, ref_sim = _build(settings_factory, shard_counts[0],
                                   backend_class)
    ref_sim.run(steps)
    ref_sim.particulator.block_until_ready()
    ref_rows = canonical_particles(ref_sim, ref_settings)
    ref_fields = {
        f: _global_field(ref_sim, ref_settings, f) for f in fields
    }
    for n_shards in shard_counts[1:]:
        settings, sim = _build(settings_factory, n_shards, backend_class)
        sim.run(steps)
        sim.particulator.block_until_ready()
        rows = canonical_particles(sim, settings)
        assert rows.shape == ref_rows.shape, (
            f"alive-count mismatch at n_shards={n_shards}: "
            f"{rows.shape} vs {ref_rows.shape}"
        )
        # identity key and multiplicities must match exactly (same global
        # sampling; collisions are off so multiplicities never change)
        np.testing.assert_array_equal(
            rows[:, 0], ref_rows[:, 0],
            err_msg=f"particle identity mismatch at n_shards={n_shards}",
        )
        np.testing.assert_array_equal(
            rows[:, 4], ref_rows[:, 4],
            err_msg=f"multiplicity mismatch at n_shards={n_shards}",
        )
        # positions in grid units and water mass: absolute errors (the
        # stiff Koehler equilibrium chaotically amplifies f64 reassociation
        # differences between summation orders — relative errors on
        # near-zero haze masses are not meaningful)
        report[f"position_max_abs_n{n_shards}"] = float(
            np.max(np.abs(rows[:, 1:3] - ref_rows[:, 1:3]))
        )
        report[f"water_mass_max_abs_n{n_shards}"] = float(
            np.max(np.abs(rows[:, 3] - ref_rows[:, 3]))
        )
        for f in fields:
            g = _global_field(sim, settings, f)
            report[f"{f}_max_rel_n{n_shards}"] = float(
                np.max(
                    np.abs(g - ref_fields[f])
                    / np.maximum(np.abs(ref_fields[f]), 1e-300)
                )
            )
    return report


def _global_field(sim, settings, name):
    nx, nz = settings.grid
    return np.asarray(sim.get_env(name), dtype=np.float64).reshape(nx, nz)
