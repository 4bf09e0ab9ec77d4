"""Single-chip n_sd scaling ladder (VERDICT r4 item: the reference
benchmark sweeps sizes, ``example_benchmark.py:33-40``): box coalescence
2^17..2^21 SDs on the TPU. Prints one JSON line per size + a summary.

Run solo on the TPU (single-tenant tunnel)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    import bench

    n_steps = 100
    out = {}
    for exp in (17, 18, 19, 20, 21):
        n_sd = 2**exp
        t0 = time.perf_counter()
        rate, _, _ = bench._bench_box(n_sd, n_steps)
        wall = time.perf_counter() - t0
        rec = {
            "n_sd": n_sd,
            "pair_updates_per_s": float(f"{rate:.4g}"),
            "wall_s_incl_compile": round(wall, 1),
        }
        out[f"2^{exp}"] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({"ladder": out}))


if __name__ == "__main__":
    main()
