"""Roofline accounting for the box-coalescence step (PERF_NOTES.md):
measures the full fused step and — for reference — what the retired
bucket-shuffle sort WOULD cost (K-chained single-dispatch timing —
per-call host timing is unreliable over the axon tunnel), and reports
bytes-touched vs the v5e HBM bound.

Since round 5 the default box step uses the sort-free mirror croupier
(`ops/pairing.py` + `fused_coalesce_mirror_blocks`): the ``sort_only``
number is the cost the step NO LONGER pays (the round-4 step was 79%
sort); ``full_step_ms`` is the mirror step.

Run on the TPU; nothing else may touch the chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

HBM_GB_S = 819.0  # TPU v5e HBM bandwidth (public spec)
K = 30
N_SD = 2**20


def chained_ms(fn, state, k=K):
    """time k data-dependent invocations in ONE dispatch. The completion
    barrier fetches ONE device-reduced scalar: fetching every state leaf
    costs ~an RTT per leaf over the axon tunnel and dominates the
    measurement (observed: a 2.4 ms step reading as 44 ms)."""
    @jax.jit
    def run(s):
        out = jax.lax.fori_loop(jnp.int32(0), jnp.int32(k), fn, s)
        sink = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(out):
            sink = sink + jnp.sum(leaf).astype(jnp.float32)
        return out, sink

    _, sink = run(state)
    float(sink)  # warm + completion barrier
    t0 = time.perf_counter()
    _, sink = run(state)
    float(sink)
    return (time.perf_counter() - t0) / k * 1e3


def main():
    sys.path.insert(0, os.getcwd())
    import bench

    particulator = bench._build_box(N_SD)
    particulator.run(1)
    particulator.block_until_ready()
    sim0 = particulator.sim_state

    # full step
    step = particulator._step_fn_raw

    def full(i, sim):
        return step(sim)

    full_ms = chained_ms(full, sim0)

    # sort phase only: bucket shuffle with a fresh fold of the key
    from pysdm_tpu.ops.segments import bucket_shuffle_state

    n_cell = particulator.mesh.n_cell
    mesh = particulator.mesh

    def sort_only(i, sim):
        p = sim["particles"]
        key = jax.random.fold_in(sim["key"], i)
        rand = jax.random.bits(key, (p.n_sd,), jnp.uint32)
        p2, _, _, _ = bucket_shuffle_state(p, rand, n_cell, mesh)
        return {**sim, "particles": p2}

    sort_ms = chained_ms(sort_only, sim0)

    # bytes accounting (per step): the sort carries u32 key + payload rows
    p = sim0["particles"]
    payload_bytes = sum(
        np.asarray(a).dtype.itemsize * N_SD
        for a in ([p.multiplicity] + list(p.extensive) + list(p.maximum)
                  + list(p.position_in_cell))
    )
    key_bytes = 4 * N_SD
    one_pass = payload_bytes + key_bytes
    pair_phase_bytes = 2 * one_pass  # kernel+gamma+coalesce reads+writes

    out = {
        "full_step_ms": round(full_ms, 3),
        "retired_sort_would_cost_ms": round(sort_ms, 3),
        "state_bytes_per_pass_MB": round(one_pass / 2**20, 2),
        "hbm_bound_single_pass_ms": round(one_pass / (HBM_GB_S * 1e6), 4),
        "implied_sort_passes_at_hbm_bound": round(
            sort_ms / (one_pass / (HBM_GB_S * 1e6)), 1
        ),
        "implied_pair_passes_at_hbm_bound": round(
            (full_ms - sort_ms) / (one_pass / (HBM_GB_S * 1e6)), 1
        ),
        "pair_updates_per_s": round(N_SD / 2 / (full_ms / 1e3)),
        "n_sd": N_SD,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
