"""Calibrate ``bench.py``'s ``REFERENCE_PAIR_UPDATES_PER_S`` denominator.

The reference (PySDM Numba CPU backend) cannot run here — numba is not
installed — so this script re-implements the reference's box-coalescence
per-step pipeline (semantics of
``PySDM/backends/impl_numba/methods/collisions_methods.py``:
``compute_gamma`` 523-560, ``coalesce`` 45-59, plus the per-step shuffle /
pair-probability phases the step dispatches) in vectorized NumPy and times
it on this host at the bench's box size (2^20 SDs, Golovin kernel).

Vectorized NumPy is a reasonable stand-in for single-threaded Numba on
this memory-bound workload (both stream the same arrays through the same
arithmetic; njit removes interpreter overhead that vectorized NumPy has
already amortized). The reference backend is *multithreaded* Numba
(``numba.prange``), so the published denominator scales the single-thread
measurement by an assumed thread speedup — documented in the output and
in ``bench.py``.

Run: ``python tools/baseline_numpy_box.py``  (CPU-only, ~1 min)
"""

import json
import time

import numpy as np

N_SD = 2**20
N_STEPS = 20
DT = 1.0
DV = 1e6
B_GOLOVIN = 1.5e3
# assumed multithreaded-Numba speedup over single-thread vectorized NumPy
# on a typical reference-user machine (16 hw threads at 50% parallel
# efficiency on this bandwidth-bound loop) — deliberately generous to the
# reference; this host has too few cores (2) to measure thread scaling
ASSUMED_THREAD_SPEEDUP = 8.0


def step(rng, mult, volume):
    """one box SDM coalescence step, reference semantics, vectorized"""
    n_sd = mult.shape[0]
    n_pair = n_sd // 2
    # shuffle_global (collisions_methods.py:700-720): permutation from u01
    perm = np.argsort(rng.random(n_sd), kind="stable")
    j = perm[0:2 * n_pair:2]
    k = perm[1:2 * n_pair:2]
    # max/min ordering: j carries the larger multiplicity
    swap = mult[k] > mult[j]
    j2 = np.where(swap, k, j)
    k2 = np.where(swap, j, k)
    j, k = j2, k2
    # pair probability (Golovin kernel) * upscaling (collision prob scaling)
    kern = B_GOLOVIN * (volume[j] + volume[k])
    prob = kern * DT / DV * np.maximum(mult[j], mult[k])
    prob *= (2 * n_pair - 1) / n_pair  # n(n-1)/2 / floor(n/2) upscale
    # compute_gamma (523-560)
    rand = rng.random(n_pair)
    gamma = np.ceil(prob - rand)
    prop = mult[j] // np.maximum(mult[k], 1)
    gamma = np.minimum(gamma, prop).astype(np.float64)
    gamma = np.where(mult[k] > 0, gamma, 0.0)
    # coalesce (45-59)
    new_n = mult[j] - gamma * mult[k]
    deplete = new_n <= 0
    mult_j_new = np.where(deplete, mult[k] // 2, new_n)
    mult_k_new = np.where(deplete, mult[k] - mult[k] // 2, mult[k])
    vol_k_new = volume[k] + gamma * volume[j]
    vol_j_new = np.where(deplete, vol_k_new, volume[j])
    mult[j] = mult_j_new
    mult[k] = mult_k_new
    volume[k] = vol_k_new
    volume[j] = vol_j_new
    return mult, volume


def main():
    rng = np.random.default_rng(44)
    x_0 = 4 / 3 * np.pi * (30.531e-6) ** 3
    volume = rng.exponential(x_0, N_SD)
    mult = np.full(N_SD, (2**23) * 1e6 * DV / N_SD // 1, dtype=np.float64)

    step(rng, mult.copy(), volume.copy())  # warm page cache
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        mult, volume = step(rng, mult, volume)
    elapsed = time.perf_counter() - t0
    rate_1t = N_SD / 2 * N_STEPS / elapsed
    print(json.dumps({
        "numpy_single_thread_pair_updates_per_s": float(f"{rate_1t:.4g}"),
        "assumed_thread_speedup": ASSUMED_THREAD_SPEEDUP,
        "reference_denominator": float(f"{rate_1t * ASSUMED_THREAD_SPEEDUP:.4g}"),
        "host_cores": __import__("os").cpu_count(),
        "n_sd": N_SD,
        "n_steps": N_STEPS,
    }))


if __name__ == "__main__":
    main()
