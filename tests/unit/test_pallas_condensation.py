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
