"""Benchmark: SDM throughput on the available device. Prints exactly ONE
JSON line — always, even when the device is wedged (see Resilience below).

Configs measured (per BASELINE.json):

1. 0D box, Golovin kernel, exponential spectrum, 2^20 SDs, 100 steps
   (the reference's headline box case — scaled-up
   ``examples/PySDM_examples/Shima_et_al_2009/example.py:50-57``).
   Primary metric: super-droplet pair-updates/s (n_sd/2 x steps / wall s).
   On TPU this exercises the fused Pallas coalesce path; the same case is
   re-run with ``PYSDM_TPU_NO_PALLAS=1`` to record the measured
   Pallas-vs-XLA delta and to cross-check the two paths agree (same RNG
   stream -> same collision outcomes up to f32 rounding).
2. 0D box + geometric kernel + collisional breakup, 2^17 SDs, 100 steps
   (BASELINE config #2, ``deJong_Mackay_et_al_2023``): pair-updates/s.
3. Adiabatic parcel activation, 2^17 SDs, 100 steps (BASELINE config #3,
   ``Abdul_Razzak_Ghan_2000``/``Pyrcel``-style): droplet-steps/s —
   exercises the fused Pallas condensation kernel
   (``ops/pallas/condensation.py``).
4. 2D kinematic warm-rain (Arabas et al. 2015), 25x25 grid, full physics
   (condensation + MPDATA + displacement/sedimentation + coalescence) —
   the north-star config (reference
   ``examples/PySDM_examples/Arabas_et_al_2015/example_benchmark.py:26-66``;
   the reference harness runs 100 steps at 2^14..2^15 SDs/gridbox with
   condensation off; here: 2^12 SDs/gridbox = 2.56M SDs, condensation on).
   Metrics: grid-points/s and pair-updates/s (reported in "extra").

``vs_baseline`` divides by an estimate of the reference's multi-threaded
Numba CPU backend on the box case (~2e7 pair-updates/s; the reference
publishes no absolute numbers — see BASELINE.md — and cannot run here
since numba is not installed).

Resilience (round-2 lesson: the TPU tunnel can be wedged — BENCH_r02 died
with FAILED_PRECONDITION on the first device op, and device attach has
been observed to take ~270 s): the parent process re-execs itself as a
``--child`` under a generous timeout, retries once, then degrades to the
XLA path (no Pallas), then to CPU, and finally emits an error JSON line
rather than nothing.

Measured numbers are recorded in BENCH_r*.json at the repo root.

Measured on the attached TPU v5e chip (2026-08-20, round 3): box config
2.178e8 pair-updates/s with the fused Pallas coalesce vs 1.530e8 on the
pure-XLA path — a 1.42x kernel speedup with same-RNG-stream allclose
between the two paths (``box_pallas_xla_allclose``).
"""

import json
import os
import subprocess
import sys
import time


REFERENCE_PAIR_UPDATES_PER_S = 2.0e7  # estimated PySDM Numba CPU backend

BOX_N_SD = 2**20
BOX_N_STEPS = 100
WR_GRID = (25, 25)
WR_N_SD_PER_GRIDBOX = 2**12
WR_N_STEPS = 30


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

    particulator.run(1)  # compile + warm up
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
        return None, f"timeout after {timeout_s}s"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode == 0 and lines:
        try:
            return json.loads(lines[-1]), ""
        except json.JSONDecodeError as exc:
            return None, f"bad JSON: {exc}"
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-6:]
    return None, f"rc={proc.returncode}: " + " | ".join(tail)[-500:]


def _attempt_ladder(config, timeouts, retry=True):
    """each benchmark config runs in its own subprocess (a device fault in
    one config cannot take down the others) with per-config degradation:
    retry once (unless ``retry=False`` — heavy configs bound total wall
    time), then XLA-only, then CPU."""
    attempts = (
        ({}, timeouts[0]),
        *((({}, timeouts[1]),) if retry else ()),  # transient faults heal
        # fused coalesce/cumsum on, XLA condensation — the condensation
        # kernel is the newest and the first to drop if faults appear
        ({"PYSDM_TPU_NO_PALLAS_COND": "1"}, timeouts[1]),
        ({"PYSDM_TPU_NO_PALLAS": "1"}, timeouts[1]),
        ({"PYSDM_TPU_BENCH_CPU": "1"}, timeouts[1]),
    )
    errors = []
    for i, (env_overrides, timeout_s) in enumerate(attempts):
        result, err = _run_child(config, env_overrides, timeout_s)
        if result is not None:
            if i > 0:
                result["degraded_attempt"] = i
                result["prior_errors"] = errors
            return result
        errors.append(f"attempt {i} ({env_overrides}): {err}")
    return {"error": "; ".join(errors)[-800:]}


def main():
    box = _attempt_ladder("box", (1800, 1200))
    # warm-rain full-step XLA compile alone takes ~450 s on the axon tunnel
    # (collision 335 s + condensation 80 s measured per-dynamic); run(1) +
    # run(n) compile two program variants, so give the first attempt room
    warm_rain = _attempt_ladder("warm_rain", (3300, 1800), retry=False)
    breakup = _attempt_ladder("breakup", (1500, 900), retry=False)
    parcel = _attempt_ladder("parcel", (900, 600))

    extra = {}
    extra.update({k: v for k, v in box.items() if k != "box_pair_updates_per_s"})
    for name, result in (
        ("warm_rain", warm_rain), ("breakup", breakup), ("parcel", parcel)
    ):
        for key, value in result.items():
            extra[
                name + "_" + key
                if key in ("platform", "error", "degraded_attempt",
                           "prior_errors")
                else key
            ] = value
    rate = box.get("box_pair_updates_per_s", 0.0)
    print(
        json.dumps(
            {
                "metric": "sd_pair_updates_per_s",
                "value": rate,
                "unit": "pair-updates/s",
                "vs_baseline": float(
                    f"{rate / REFERENCE_PAIR_UPDATES_PER_S:.4g}"
                ),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
