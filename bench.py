"""Benchmark: SDM collisional-coalescence throughput on the available device.

Setup: 0D box, Golovin kernel, exponential spectrum (the reference's headline
box case — ``examples/PySDM_examples/Shima_et_al_2009/example.py`` scaled up),
float32 compute / int64 multiplicities (the TPU production dtype policy).

Metric: super-droplet pair-updates per second — candidate pairs processed per
wall second (n_sd/2 pairs per substep x substeps x steps / time), the
BASELINE.json north-star per-chip unit. ``vs_baseline`` divides by an estimate
of the reference's multi-threaded Numba CPU backend on the same case
(~2e7 pair-updates/s; the reference publishes no absolute numbers — see
BASELINE.md — and cannot run here since numba is not installed).

Perf notes (TPU v5e, 2^20 SDs): one variadic ``lax.sort`` carries the whole
particle state as payload operands (gathers/scatters are the slow path on
TPU), per-cell reductions are cumsum differences, rate counters accumulate in
f32 — ~4.8 ms/step = ~1.1e8 pair-updates/s (vs 338 ms/step for the naive
gather/scatter/segment_sum formulation).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


REFERENCE_PAIR_UPDATES_PER_S = 2.0e7  # estimated PySDM Numba CPU backend


def main():
    from pysdm_tpu import Builder, Formulae
    from pysdm_tpu.backends import TPU
    from pysdm_tpu.dynamics import Coalescence
    from pysdm_tpu.dynamics.collisions.collision_kernels import Golovin
    from pysdm_tpu.environments import Box
    from pysdm_tpu.initialisation.sampling.spectral_sampling import (
        ConstantMultiplicity,
    )
    from pysdm_tpu.initialisation.spectra import Exponential
    from pysdm_tpu.physics import si

    n_sd = 2**20
    n_steps = 100
    formulae = Formulae(seed=44)
    env = Box(dv=1e6 * si.m**3, dt=1.0 * si.s)
    builder = Builder(n_sd=n_sd, backend=TPU(formulae), environment=env)
    x_0 = float(formulae.trivia.volume(radius=30.531 * si.um))
    spectrum = Exponential(norm_factor=(2**23) * 1e6, scale=x_0)
    builder.add_dynamic(
        Coalescence(collision_kernel=Golovin(b=1.5e3), adaptive=False)
    )
    attributes = {}
    attributes["volume"], attributes["multiplicity"] = ConstantMultiplicity(
        spectrum
    ).sample(n_sd)
    particulator = builder.build(attributes)

    mult0 = particulator.attributes["multiplicity"]
    mass0 = float(
        (mult0 * particulator.attributes["water mass"]).sum()
    )
    count0 = float(mult0.sum())

    # warm-up: compile + one step
    particulator.run(1)
    particulator.block_until_ready()

    t0 = time.perf_counter()
    particulator.run(n_steps)
    particulator.block_until_ready()
    elapsed = time.perf_counter() - t0

    pair_updates = n_sd / 2 * n_steps
    rate = pair_updates / elapsed

    # sanity: mass must be conserved and coalescence must have happened
    # (this validates the TPU-only fused Pallas collision path on device —
    # CPU tests exercise it in interpret mode only)
    mult = particulator.attributes["multiplicity"]
    assert (mult >= 0).all()
    mass1 = float((mult * particulator.attributes["water mass"]).sum())
    count1 = float(mult.sum())
    assert abs(mass1 - mass0) <= 1e-6 * mass0, (mass0, mass1)
    assert count1 < count0, "no coalescence happened"

    print(
        json.dumps(
            {
                "metric": "sd_pair_updates_per_s",
                "value": float(f"{rate:.4g}"),
                "unit": "pair-updates/s",
                "vs_baseline": float(f"{rate / REFERENCE_PAIR_UPDATES_PER_S:.4g}"),
            }
        )
    )


if __name__ == "__main__":
    main()
