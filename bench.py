"""Benchmark: SDM throughput on the available device.

Prints a consolidated JSON line (``{"metric", "value", "unit",
"vs_baseline", "extra"}``) after EVERY config completes — flushed
immediately — so a driver-side timeout at any point still captures every
number measured so far (the LAST line is always the most complete
record). Round-3 lesson: the previous all-or-nothing ``main()`` printed
only at the very end and the driver timeout captured zero bytes
(BENCH_r03.json rc=124, empty tail).

Configs, in headline-first order (per BASELINE.json):

1. ``box`` — 0D box, Golovin kernel, exponential spectrum, 2^20 SDs,
   100 steps (the reference's headline box case — scaled-up
   ``examples/PySDM_examples/Shima_et_al_2009/example.py:50-57``).
   Primary metric: super-droplet pair-updates/s. Exercises the fused
   Pallas coalesce path and re-runs with ``PYSDM_TPU_NO_PALLAS=1`` to
   record the Pallas-vs-XLA delta + same-RNG cross-check.
2. ``parcel`` — adiabatic parcel activation, 2^17 SDs, 100 steps
   (BASELINE config #3): droplet-steps/s — exercises the fused Pallas
   condensation kernel (``ops/pallas/condensation.py``).
3. ``breakup`` — box + geometric kernel + collisional breakup, 2^17 SDs,
   100 steps (BASELINE config #2, ``deJong_Mackay_et_al_2023``).
4. ``warm_rain`` — 2D kinematic warm-rain (Arabas et al. 2015), 25x25
   grid, 2^12 SDs/gridbox = 2.56M SDs, full physics — the north-star
   config (reference
   ``examples/PySDM_examples/Arabas_et_al_2015/example_benchmark.py:26-66``).

Wall-clock budget: the whole run targets ``PYSDM_TPU_BENCH_BUDGET_S``
(default 1650 s, i.e. fits ``timeout 1800 python bench.py``). Configs
whose remaining-budget share cannot fit are skipped (recorded in
``extra``) rather than blowing the budget.

Compilation cache: every child process enables the JAX persistent
compilation cache (``.jax_cache/`` at the repo root), so retries and
driver re-runs skip the 80-450 s tunnel-side compiles measured in
round 3 (PERF_NOTES.md) once the cache is warm.

``vs_baseline`` divides by a *measured* stand-in for the reference's
multithreaded-Numba CPU backend: ``tools/baseline_numpy_box.py``
re-implements the reference box step (semantics of
``PySDM/backends/impl_numba/methods/collisions_methods.py:45-59,523-560``)
in vectorized NumPy and measured 1.509e6 pair-updates/s single-thread on
this host (2026-08-21); the denominator scales that by an assumed (and
deliberately generous) 8x multithreaded-Numba speedup -> 1.2e7.

Resilience: each config runs in its own subprocess (a device fault in one
cannot take down the rest) behind a degradation ladder — retry, then
drop the fused condensation kernel (condensation configs only), then all
Pallas, then CPU — and the parent emits an error entry rather than
nothing. The TPU tunnel is single-tenant: never run anything else
against the chip while this script runs.
"""

import json
import os
import subprocess
import sys
import time

# measured basis: tools/baseline_numpy_box.py on this host (2 cores,
# 2026-08-21) -> 1.509e6 pair-updates/s single-thread vectorized NumPy
# for the reference box pipeline at 2^20 SDs; x8 assumed thread speedup
REFERENCE_PAIR_UPDATES_PER_S = 1.2e7

BOX_N_SD = 2**20
BOX_N_STEPS = 100
WR_GRID = (25, 25)
WR_N_SD_PER_GRIDBOX = 2**12
WR_N_STEPS = 30

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def _enable_compile_cache():
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _build_box(n_sd):
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
    return builder.build(attributes)


def _bench_box(n_sd, n_steps):
    """returns (pair_updates_per_s, final_count, final_mass)"""
    particulator = _build_box(n_sd)
    mult0 = particulator.attributes["multiplicity"]
    mass0 = float((mult0 * particulator.attributes["water mass"]).sum())
    count0 = float(mult0.sum())

    particulator.run(1)  # compile + warm up
    particulator.block_until_ready()

    t0 = time.perf_counter()
    particulator.run(n_steps)
    particulator.block_until_ready()
    elapsed = time.perf_counter() - t0

    # sanity: mass conserved, coalescence happened (validates the collision
    # path on the actual device — CPU tests run Pallas in interpret mode)
    mult = particulator.attributes["multiplicity"]
    assert bool((mult >= 0).all())
    mass1 = float((mult * particulator.attributes["water mass"]).sum())
    count1 = float(mult.sum())
    assert abs(mass1 - mass0) <= 1e-6 * mass0, (mass0, mass1)
    assert count1 < count0, "no coalescence happened"

    return (n_sd / 2 * n_steps) / elapsed, count1, mass1


def _bench_warm_rain():
    """flagship 2D config; returns dict of metrics"""
    from pysdm_tpu.backends import TPU
    from pysdm_tpu.models.arabas_et_al_2015 import Settings, make_simulation
    from pysdm_tpu.physics import Formulae, si

    # the CPU fallback rung cannot finish the full 2.56M-SD case inside the
    # ladder timeout — shrink so a degraded run still yields a number
    n_per_gridbox = (
        2**7 if os.environ.get("PYSDM_TPU_BENCH_CPU") else WR_N_SD_PER_GRIDBOX
    )
    settings = Settings(
        Formulae(seed=44),
        grid=WR_GRID,
        size=(1500 * si.m, 1500 * si.m),
        n_sd_per_gridbox=n_per_gridbox,
        spin_up_time=0,
    )
    particulator, spin_up = make_simulation(settings, backend_class=TPU)
    spin_up.finish()

    particulator.run(1)  # compile + warm up (same program as run(n):
    # multi_step takes the step count as a traced argument)
    particulator.block_until_ready()

    t0 = time.perf_counter()
    particulator.run(WR_N_STEPS)
    particulator.block_until_ready()
    elapsed = time.perf_counter() - t0

    n_cell = WR_GRID[0] * WR_GRID[1]
    n_sd = settings.n_sd
    return {
        "warm_rain_grid_points_per_s": float(
            f"{n_cell * WR_N_STEPS / elapsed:.4g}"
        ),
        "warm_rain_pair_updates_per_s": float(
            f"{n_sd / 2 * WR_N_STEPS / elapsed:.4g}"
        ),
        "warm_rain_ms_per_step": float(f"{elapsed / WR_N_STEPS * 1e3:.4g}"),
        "warm_rain_grid": f"{WR_GRID[0]}x{WR_GRID[1]}",
        "warm_rain_n_sd": n_sd,
    }


def _bench_breakup(n_sd, n_steps):
    """BASELINE config #2: box, geometric kernel + collisional breakup
    (reference ``examples/PySDM_examples/deJong_Mackay_et_al_2023``);
    returns pair-updates/s"""
    from pysdm_tpu import Builder
    from pysdm_tpu.backends import TPU
    from pysdm_tpu.dynamics import Collision
    from pysdm_tpu.environments import Box
    from pysdm_tpu.initialisation.sampling.spectral_sampling import (
        ConstantMultiplicity,
    )
    from pysdm_tpu.models.dejong_mackay_et_al_2023 import Settings0D

    s = Settings0D(seed=44, warn_overflows=False)
    s.n_sd = n_sd
    env = Box(dv=s.dv, dt=s.dt)
    builder = Builder(n_sd=n_sd, backend=TPU(s.formulae), environment=env)
    builder.add_dynamic(
        Collision(
            collision_kernel=s.kernel,
            coalescence_efficiency=s.coal_eff,
            breakup_efficiency=s.break_eff,
            fragmentation_function=s.fragmentation,
            adaptive=s.adaptive,
            warn_overflows=False,
        )
    )
    attributes = {}
    attributes["volume"], attributes["multiplicity"] = ConstantMultiplicity(
        s.spectrum
    ).sample(n_sd)
    particulator = builder.build(attributes)
    mult0 = particulator.attributes["multiplicity"]
    mass0 = float((mult0 * particulator.attributes["water mass"]).sum())

    particulator.run(1)
    particulator.block_until_ready()
    t0 = time.perf_counter()
    particulator.run(n_steps)
    particulator.block_until_ready()
    elapsed = time.perf_counter() - t0

    mult = particulator.attributes["multiplicity"]
    mass1 = float((mult * particulator.attributes["water mass"]).sum())
    assert abs(mass1 - mass0) <= 1e-5 * mass0, (mass0, mass1)
    return (n_sd / 2 * n_steps) / elapsed


def _bench_parcel(n_sd, n_steps):
    """BASELINE config #3: adiabatic parcel activation (reference
    ``examples/PySDM_examples/Abdul_Razzak_Ghan_2000`` / ``Pyrcel``);
    returns droplet-steps/s (exercises the fused Pallas condensation
    kernel on TPU)"""
    from pysdm_tpu import Builder, Formulae
    from pysdm_tpu.backends import TPU
    from pysdm_tpu.dynamics import AmbientThermodynamics, Condensation
    from pysdm_tpu.environments import Parcel
    from pysdm_tpu.initialisation.sampling.spectral_sampling import (
        ConstantMultiplicity,
    )
    from pysdm_tpu.initialisation.spectra import Lognormal

    formulae = Formulae(seed=44)
    env = Parcel(
        dt=1.0, mass_of_dry_air=1e3, p0=1000e2,
        initial_water_vapour_mixing_ratio=0.0158, T0=300.0, w=2.0,
    )
    builder = Builder(n_sd=n_sd, backend=TPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation(adaptive=True))
    spectrum = Lognormal(norm_factor=1e8 * 1e3, m_mode=50e-9, s_geom=1.5)
    r_dry, n_in_dv = ConstantMultiplicity(spectrum).sample(n_sd)
    attributes = env.init_attributes(n_in_dv=n_in_dv, kappa=0.5, r_dry=r_dry)
    particulator = builder.build(attributes)

    particulator.run(1)
    particulator.block_until_ready()
    t0 = time.perf_counter()
    particulator.run(n_steps)
    particulator.block_until_ready()
    elapsed = time.perf_counter() - t0

    import numpy as np

    assert bool(np.asarray(particulator.get_counter("condensation_success")).all())
    return n_sd * n_steps / elapsed


def child(config):
    if os.environ.get("PYSDM_TPU_BENCH_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    import jax

    platform = jax.devices()[0].platform
    out = {"platform": platform}

    if config == "box":
        pallas_was_on = not os.environ.get("PYSDM_TPU_NO_PALLAS")
        rate, count1, mass1 = _bench_box(BOX_N_SD, BOX_N_STEPS)
        out["box_pair_updates_per_s"] = float(f"{rate:.4g}")
        if pallas_was_on and platform not in ("cpu",):
            # measured Pallas-vs-XLA delta + cross-check on the same RNG
            # stream (this is the only on-silicon validation of the fused
            # kernel — CPU tests run it in interpret mode)
            os.environ["PYSDM_TPU_NO_PALLAS"] = "1"
            try:
                rate_xla, count_xla, mass_xla = _bench_box(
                    BOX_N_SD, BOX_N_STEPS
                )
                out["box_xla_pair_updates_per_s"] = float(f"{rate_xla:.4g}")
                out["box_pallas_vs_xla_speedup"] = float(
                    f"{rate / rate_xla:.3g}"
                )
                # same u01 stream -> same outcomes up to f32 rounding
                assert abs(count_xla - count1) <= 5e-3 * count1
                assert abs(mass_xla - mass1) <= 1e-6 * mass1
                out["box_pallas_xla_allclose"] = True
            finally:
                del os.environ["PYSDM_TPU_NO_PALLAS"]
    elif config == "warm_rain":
        out.update(_bench_warm_rain())
    elif config == "breakup":
        rate = _bench_breakup(2**17, 100)
        out["breakup_pair_updates_per_s"] = float(f"{rate:.4g}")
    elif config == "parcel":
        rate = _bench_parcel(2**17, 100)
        out["parcel_droplet_steps_per_s"] = float(f"{rate:.4g}")
    else:
        raise SystemExit(f"unknown config {config}")
    print(json.dumps(out))


def _run_child(config, env_overrides, timeout_s):
    """run `python bench.py --child CONFIG`; returns (json|None, error)"""
    env = dict(os.environ)
    env.update(env_overrides)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", config],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=env,
            check=False,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s:.0f}s"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode == 0 and lines:
        try:
            return json.loads(lines[-1]), ""
        except json.JSONDecodeError as exc:
            return None, f"bad JSON: {exc}"
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-6:]
    return None, f"rc={proc.returncode}: " + " | ".join(tail)[-500:]


# per-config subprocess degradation ladder: (env_overrides, nominal
# timeout). NO_PALLAS_COND only exists on configs that run condensation
# (ADVICE r3: a box fault would burn a rung on an identical re-run).
_LADDERS = {
    "box": (
        ({}, 1500),
        ({}, 900),  # transient tunnel faults heal on retry
        ({"PYSDM_TPU_NO_PALLAS": "1"}, 900),
        ({"PYSDM_TPU_BENCH_CPU": "1"}, 900),
    ),
    "parcel": (
        ({}, 900),
        ({"PYSDM_TPU_NO_PALLAS_COND": "1"}, 600),
        ({"PYSDM_TPU_NO_PALLAS": "1"}, 600),
        ({"PYSDM_TPU_BENCH_CPU": "1"}, 600),
    ),
    "breakup": (
        ({}, 1200),
        ({"PYSDM_TPU_NO_PALLAS": "1"}, 900),
        ({"PYSDM_TPU_BENCH_CPU": "1"}, 600),
    ),
    "warm_rain": (
        ({}, 3300),
        ({"PYSDM_TPU_NO_PALLAS_COND": "1"}, 1800),
        ({"PYSDM_TPU_NO_PALLAS": "1"}, 1800),
        ({"PYSDM_TPU_BENCH_CPU": "1"}, 900),
    ),
}
# skip a config outright when less budget than this remains: enough for a
# cache-warm run (compile skipped) but not for a cold 300-450 s compile
_MIN_REMAINING = {"box": 120, "parcel": 120, "breakup": 120, "warm_rain": 240}


def _attempt_ladder(config, deadline):
    """walk the config's degradation ladder, clamping every attempt to the
    remaining wall-clock budget; gives up (recording why) at the deadline"""
    errors = []
    for i, (env_overrides, nominal_timeout) in enumerate(_LADDERS[config]):
        remaining = deadline - time.monotonic()
        if remaining < 60:
            errors.append(f"attempt {i}: skipped (budget exhausted)")
            break
        result, err = _run_child(
            config, env_overrides, min(nominal_timeout, remaining)
        )
        if result is not None:
            if i > 0:
                result["degraded_attempt"] = i
                result["prior_errors"] = errors
            return result
        errors.append(f"attempt {i} ({env_overrides}): {err}")
    return {"error": "; ".join(errors)[-800:]}


def _consolidated(results):
    """merge per-config results into the driver-facing record"""
    extra = {}
    for name, result in results.items():
        for key, value in result.items():
            extra[
                name + "_" + key
                if key in ("platform", "error", "skipped", "degraded_attempt",
                           "prior_errors")
                else key
            ] = value
    rate = results.get("box", {}).get("box_pair_updates_per_s", 0.0)
    return {
        "metric": "sd_pair_updates_per_s",
        "value": rate,
        "unit": "pair-updates/s",
        "vs_baseline": float(f"{rate / REFERENCE_PAIR_UPDATES_PER_S:.4g}"),
        "extra": extra,
    }


def main():
    budget = float(os.environ.get("PYSDM_TPU_BENCH_BUDGET_S", 1650))
    t_start = time.monotonic()
    deadline = t_start + budget
    results = {}
    for config in ("box", "parcel", "breakup", "warm_rain"):
        remaining = deadline - time.monotonic()
        if remaining < _MIN_REMAINING[config]:
            results[config] = {
                "skipped": f"budget: {remaining:.0f}s left, "
                           f"need >={_MIN_REMAINING[config]}s"
            }
        else:
            results[config] = _attempt_ladder(config, deadline)
        # flush a full consolidated record after EVERY config: a driver
        # timeout at any point still captures everything measured so far
        print(json.dumps(_consolidated(results)), flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
