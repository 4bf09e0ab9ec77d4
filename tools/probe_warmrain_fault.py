"""Bisect the fused-condensation kernel fault inside the warm-rain
program (round-4 follow-up to round 3's early-exit fault, PERF_NOTES.md):
run a small warm-rain config with a chosen grid / SDs-per-gridbox so the
total drop count is either block-aligned (multiple of 32768 — the only
shape class the kernel had ever run at: parcel 2^17, box 2^20) or
padded (the warm-rain 2.56M = 78.125-block case that faults).

Usage: python tools/probe_warmrain_fault.py NX NZ LOG2_PER_GB [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    nx, nz, log2pg = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pysdm_tpu.backends import TPU
    from pysdm_tpu.models.arabas_et_al_2015 import Settings, make_simulation
    from pysdm_tpu.physics import Formulae, si

    settings = Settings(
        Formulae(seed=44),
        grid=(nx, nz),
        size=(1500 * si.m, 1500 * si.m),
        n_sd_per_gridbox=2**log2pg,
        spin_up_time=0,
    )
    n = settings.n_sd
    print(f"n_sd={n} blocks={n/32768} padded={n % 32768 != 0}", flush=True)
    particulator, spin_up = make_simulation(settings, backend_class=TPU)
    spin_up.finish()
    t0 = time.perf_counter()
    try:
        particulator.run(1)
        particulator.block_until_ready()
        print(f"run(1): OK ({time.perf_counter()-t0:.0f}s)", flush=True)
        t0 = time.perf_counter()
        particulator.run(steps)
        particulator.block_until_ready()
        print(f"run({steps}): OK ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"FAULT after {time.perf_counter()-t0:.0f}s: "
              f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
