"""Microbenchmark the condensation substep's per-drop solve at warm-rain
scale (2.56M drops): fused Pallas kernel vs XLA formulation, plus the
supporting phases (cell->drop pack gather, sorted segment sum). Feeds the
roofline accounting in PERF_NOTES.md.

Run on the TPU (single-tenant tunnel — nothing else may touch the chip).
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

from pysdm_tpu import Formulae  # noqa: E402
from pysdm_tpu.ops.condensation import make_condensation_solver  # noqa: E402
from pysdm_tpu.ops.pallas.condensation import make_fused_masses_new  # noqa: E402
from pysdm_tpu.ops.segments import sorted_segment_sum  # noqa: E402

N = 2**12 * 625  # 2.56M: warm-rain bench scale
N_CELL = 625


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    f = Formulae(seed=1)
    rng = np.random.default_rng(1)
    r_wet = np.exp(rng.uniform(np.log(0.5e-6), np.log(50e-6), N))
    water_mass = (4 / 3 * np.pi * r_wet**3 * 1e3).astype(np.float32)
    vdry = np.full(N, 4 / 3 * np.pi * (5e-8) ** 3, np.float32)
    kappa = np.full(N, 0.6, np.float32)
    f_org = np.zeros(N, np.float32)
    reyn = np.full(N, 0.01, np.float32)
    thd_d = np.full(N, 297.0, np.float32)
    qv_d = np.full(N, 0.0127, np.float32)
    rhod_d = np.full(N, 1.1, np.float32)
    dts_d = np.full(N, 0.2, np.float32)
    act_d = np.ones(N, np.float32)
    rho_d = np.full(N, 1.11, np.float32)
    mu_d = np.full(N, 1.8e-5, np.float32)
    args32 = [jnp.asarray(x) for x in (
        water_mass, vdry, kappa, f_org, reyn,
        thd_d, qv_d, rhod_d, dts_d, act_d, rho_d, mu_d,
    )]

    results = {}
    for iters in (40, 24, 12):
        fused = make_fused_masses_new(
            f, RH_rtol=1e-7, max_iters=16, bisect_iters=iters
        )
        jfused = jax.jit(lambda *a, _f=fused: _f(*a, interpret=False))
        t = timeit(jfused, *args32)
        results[f"pallas_substep_ms_iters{iters}"] = round(t * 1e3, 2)

    # XLA path equivalent: full condensation solve with adaptive off,
    # 1 substep (dominated by calculate_masses_new's bracket+bisect loops)
    solver = make_condensation_solver(
        f, n_cell=N_CELL, dt=0.2, adaptive=False, use_pallas=False
    )
    cell = np.repeat(np.arange(N_CELL, dtype=np.int32), N // N_CELL)
    cell_start = jnp.asarray(
        np.arange(N_CELL + 1, dtype=np.int32) * (N // N_CELL)
    )
    attrs = dict(
        water_mass=jnp.asarray(water_mass.astype(np.float64)),
        vdry=jnp.asarray(vdry.astype(np.float64)),
        kappa=jnp.asarray(kappa.astype(np.float64)),
        f_org=jnp.asarray(f_org.astype(np.float64)),
        reynolds_number=jnp.asarray(reyn.astype(np.float64)),
        v_cr=jnp.asarray(np.full(N, 4 / 3 * np.pi * (2e-5) ** 3)),
    )
    thd_c = jnp.full(N_CELL, 297.0)
    qv_c = jnp.full(N_CELL, 0.0127)
    rhod_c = jnp.full(N_CELL, 1.1)

    def xla_solve(wm):
        return solver(
            attrs={**attrs, "water_mass": wm},
            multiplicity=jnp.ones(N),
            cell_of_drop=jnp.asarray(cell),
            cell_start=cell_start,
            n_substeps=jnp.ones(N_CELL, jnp.int32),
            thd=thd_c, qv=qv_c, rhod=rhod_c,
            pthd=thd_c, pqv=qv_c, prhod=rhod_c,
            m_d=rhod_c, air_density=rhod_c * 1.01,
            air_viscosity=jnp.full(N_CELL, 1.8e-5),
        )[0]

    t = timeit(jax.jit(xla_solve), attrs["water_mass"], n=5)
    results["xla_full_substep_ms"] = round(t * 1e3, 2)

    # supporting phases
    pack = jnp.stack([thd_c, qv_c, rhod_c, rhod_c, rhod_c, rhod_c, rhod_c], 1)
    cell_j = jnp.asarray(cell)

    def gather(pk):
        return pk[jnp.clip(cell_j, 0, N_CELL - 1)]

    results["pack_gather_ms"] = round(timeit(jax.jit(gather), pack) * 1e3, 2)
    vals = jnp.asarray(water_mass.astype(np.float64))

    def segsum(v):
        return sorted_segment_sum(v, cell_start, N_CELL)

    results["segment_sum_ms"] = round(timeit(jax.jit(segsum), vals) * 1e3, 2)

    results["n"] = N
    print(json.dumps(results))


if __name__ == "__main__":
    main()
