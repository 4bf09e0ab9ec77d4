"""Interpret-mode tests of the fused Pallas condensation kernel
(``ops/pallas/condensation.py``) against the XLA formulation
(``ops/condensation.py`` ``calculate_masses_new``): same parcel
activation run with and without the fused path (the CPU analogue of the
reference's FakeThrustRTC GPU-code testing)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.dynamics import AmbientThermodynamics, Condensation
from pysdm_tpu.environments import Parcel
from pysdm_tpu.initialisation.sampling.spectral_sampling import (
    ConstantMultiplicity,
)
from pysdm_tpu.initialisation.spectra import Lognormal


def _run_parcel(n_steps=50, n_sd=40, adaptive=False):
    formulae = Formulae(seed=44)
    env = Parcel(
        dt=1.0, mass_of_dry_air=1e3, p0=1000e2,
        initial_water_vapour_mixing_ratio=0.0158, T0=300.0, w=2.0,
    )
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation(adaptive=adaptive))
    spectrum = Lognormal(norm_factor=1e8 * 1e3, m_mode=50e-9, s_geom=1.5)
    r_dry, n_in_dv = ConstantMultiplicity(spectrum).sample(n_sd)
    attributes = env.init_attributes(n_in_dv=n_in_dv, kappa=0.5, r_dry=r_dry)
    particulator = builder.build(attributes)
    particulator.run(n_steps)
    return particulator


@pytest.mark.parametrize("adaptive", (False, True))
def test_fused_path_matches_xla(monkeypatch, adaptive):
    ref = _run_parcel(adaptive=adaptive)
    wm_ref = np.asarray(ref.get_attribute("water mass"))
    qv_ref = float(ref.get_env("qv")[0])

    monkeypatch.setenv("PYSDM_TPU_PALLAS_INTERPRET", "1")
    fused = _run_parcel(adaptive=adaptive)
    wm_fused = np.asarray(fused.get_attribute("water mass"))
    qv_fused = float(fused.get_env("qv")[0])

    assert bool(np.asarray(fused.get_counter("condensation_success")).all())
    # the fused kernel is an f32 pipeline; the XLA CPU path runs f64 —
    # trajectories agree to f32-level tolerances over 50 coupled steps
    np.testing.assert_allclose(wm_fused, wm_ref, rtol=2e-3)
    np.testing.assert_allclose(qv_fused, qv_ref, rtol=1e-4)


def test_fused_activation_sanity(monkeypatch):
    monkeypatch.setenv("PYSDM_TPU_PALLAS_INTERPRET", "1")
    p = _run_parcel(n_steps=400, adaptive=True)
    assert bool(np.asarray(p.get_counter("condensation_success")).all())
    RH_max = float(np.asarray(p.get_counter("condensation_RH_max"))[0])
    assert 1.0 < RH_max < 1.05
    # activated droplets grew well beyond their dry size
    r = np.asarray(p.get_attribute("radius"))
    assert (r > 1e-6).sum() >= p.n_sd // 2


def test_kernel_cross_lowers_for_tpu():
    """AOT-lower the fused kernel for the TPU platform on the CPU host
    (jax.export) — catches Mosaic lowering regressions (e.g. 64-bit lanes
    under the package-global x64 mode) without TPU hardware"""
    import jax
    import jax.numpy as jnp

    from pysdm_tpu.ops.pallas.condensation import make_fused_masses_new

    fused = make_fused_masses_new(
        Formulae(seed=44), RH_rtol=1e-7,
        max_iters=16, bisect_iters=64,
    )
    n = 32768
    args = [jnp.ones((n,), jnp.float32) for _ in range(12)]
    jax.export.export(
        jax.jit(lambda *a: fused(*a, interpret=False)), platforms=["tpu"]
    )(*args)


def test_coalesce_kernel_cross_lowers_for_tpu():
    import jax
    import jax.numpy as jnp

    from pysdm_tpu.ops.pallas.collision import fused_coalesce

    n = 32768
    mult = jnp.ones((n,), jnp.int64)
    ext = jnp.ones((3, n), jnp.float32)
    kern = jnp.ones((n,), jnp.float32)
    rand = jnp.full((n,), 0.5, jnp.float32)
    isf = jnp.zeros((n,), bool).at[::2].set(True)
    jax.export.export(
        jax.jit(
            lambda m, e, k, r, i: fused_coalesce(
                m, e, k, r, i, interpret=False
            )
        ),
        platforms=["tpu"],
    )(mult, ext, kern, rand, isf)


def test_f32_equilibrium_haze_succeeds_at_x_old():
    """regression for the round-4 f32 failure cascade: haze sitting at its
    f32 Koehler equilibrium must SUCCEED with (near-)unchanged mass, on
    both the XLA path and the fused kernel. Before the fa-direction
    bracket fix, minfun(x_old) == 0 (or a residual whose sign disagrees
    with dx_old through the mass(x(m)) exp/log round-trip) made these
    drops report 'unbracketable' and fail their cell every step
    (ops/condensation.py bracket expansion; reference semantics
    ``condensation_methods.py:498-530`` assume f64)."""
    import jax
    import jax.numpy as jnp

    from pysdm_tpu.ops.condensation import make_condensation_solver

    f = Formulae(seed=44)
    n = 64
    n_cell = 1
    # subsaturated cell (RH ~0.65 at thd=290, qv=7.5e-3, rhod=1.194 —
    # the exact regime of the round-4 flagship failures)
    thd = jnp.full(n_cell, 290.0, jnp.float32)
    qv = jnp.full(n_cell, 7.5e-3, jnp.float32)
    rhod = jnp.full(n_cell, 1.1944, jnp.float32)
    m_d = rhod * 1.0
    rng = np.random.default_rng(5)
    r_dry = np.exp(rng.uniform(np.log(2e-8), np.log(2e-7), n))
    vdry = (4 / 3 * np.pi * r_dry**3).astype(np.float32)
    kappa = np.full(n, 0.61, np.float32)

    # drive each drop to its f32 equilibrium first: run the solver many
    # times until masses stop changing, then assert the *settled* state
    # keeps succeeding (pre-fix: settled haze flips to persistent failure)
    solver = make_condensation_solver(
        f, n_cell=n_cell, dt=0.1, adaptive=False, use_pallas=False
    )
    wm = jnp.asarray(4 / 3 * np.pi * (2 * r_dry) ** 3 * 1e3, jnp.float32)
    attrs = dict(
        vdry=jnp.asarray(vdry), kappa=jnp.asarray(kappa),
        f_org=jnp.zeros(n, jnp.float32),
        reynolds_number=jnp.full(n, 0.01, jnp.float32),
        v_cr=jnp.asarray(4 / 3 * np.pi * (2e-5) ** 3 * np.ones(n), jnp.float32),
    )
    kwargs = dict(
        multiplicity=jnp.ones(n, jnp.float32),
        cell_of_drop=jnp.zeros(n, jnp.int32),
        cell_start=jnp.asarray([0, n], jnp.int32),
        n_substeps=jnp.ones(n_cell, jnp.int32),
        thd=thd, qv=qv, rhod=rhod, pthd=thd, pqv=qv, prhod=rhod,
        m_d=m_d, air_density=rhod * 1.0075,
        air_viscosity=jnp.full(n_cell, 1.8e-5, jnp.float32),
    )
    settled = False
    for _ in range(60):
        out = solver(attrs={**attrs, "water_mass": wm}, **kwargs)
        wm_new = out[0]
        # f32 equilibrium is a fixed point up to a bisection-granularity
        # limit cycle (~rtol_x * |x| in the log coordinate -> ~4e-5 mass)
        settled = bool(
            jnp.max(jnp.abs(wm_new - wm) / wm) < 5e-5
        )
        wm = wm_new
        if settled:
            break
    assert settled, "haze did not reach its f32 equilibrium in 60 steps"

    # at the settled f32 equilibrium: every solve must still SUCCEED and
    # keep the mass (pre-fix: success=False for the fa==0 / sign-flip drops)
    out = solver(attrs={**attrs, "water_mass": wm}, **kwargs)
    assert bool(np.asarray(out[5]).all()), "settled haze must not fail"
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(wm), rtol=1e-4
    )


def test_early_exit_honors_rtol_x():
    """the (default) early-exit bisection must deliver roots within the
    requested rtol_x: kernels built with loose vs tight tolerance agree on
    the diffusion-coordinate root to the LOOSE tolerance, and the tight
    kernel refines further (i.e. rtol_x actually steers the stop)"""
    import jax.numpy as jnp

    from pysdm_tpu.ops.pallas.condensation import make_fused_masses_new

    f = Formulae(seed=44)
    n = 4096
    rng = np.random.default_rng(11)
    r_wet = np.exp(rng.uniform(np.log(1e-6), np.log(20e-6), n))
    wm = jnp.asarray((4 / 3 * np.pi * r_wet**3 * 1e3), jnp.float32)
    r_dry = np.exp(rng.uniform(np.log(3e-8), np.log(1e-7), n))
    vdry = jnp.asarray((4 / 3 * np.pi * r_dry**3), jnp.float32)
    kappa = jnp.full((n,), 0.61, jnp.float32)
    f_org = jnp.zeros((n,), jnp.float32)
    reyn = jnp.full((n,), 0.01, jnp.float32)
    # supersaturated cell: droplets grow, roots differ from x_old
    thd_d = jnp.full((n,), 290.0, jnp.float32)
    qv_d = jnp.full((n,), 0.013, jnp.float32)
    rhod_d = jnp.full((n,), 1.1944, jnp.float32)
    dt_sub = jnp.full((n,), 0.5, jnp.float32)
    act = jnp.ones((n,), jnp.float32)
    rho_air = jnp.full((n,), 1.2, jnp.float32)
    mu_air = jnp.full((n,), 1.8e-5, jnp.float32)
    args = (wm, vdry, kappa, f_org, reyn, thd_d, qv_d, rhod_d,
            dt_sub, act, rho_air, mu_air)

    roots = {}
    for rtol_x in (1e-2, 1e-7):
        fused = make_fused_masses_new(
            f, RH_rtol=1e-7, max_iters=16, bisect_iters=64, rtol_x=rtol_x
        )
        mass_new, success = fused(*args, interpret=True)
        assert bool(np.asarray(success).all())
        roots[rtol_x] = np.asarray(
            f.diffusion_coordinate.x(jnp.asarray(mass_new)), np.float64
        )
    x_loose, x_tight = roots[1e-2], roots[1e-7]
    # droplets actually moved
    x_old = np.asarray(f.diffusion_coordinate.x(wm), np.float64)
    assert np.max(np.abs(x_tight - x_old)) > 0
    # loose root within its own tolerance of the refined root
    np.testing.assert_allclose(x_loose, x_tight, rtol=2e-2)
    # and the tolerances differ in effect (early exit actually triggers)
    assert np.max(np.abs(x_loose - x_tight)) > 0
