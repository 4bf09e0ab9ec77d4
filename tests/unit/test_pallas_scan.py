"""Pallas single-pass cumsum kernel (``ops/pallas/scan.py``): interpret-mode
equivalence with jnp.cumsum (the compiled path is exercised on real TPU by
bench.py; tests run on the CPU backend where ``cumsum`` falls back to
jnp.cumsum, so the kernel body is checked via interpret=True)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysdm_tpu.ops.pallas.scan import _BLOCK, _cumsum_pallas, cumsum


class TestPallasCumsum:
    @staticmethod
    @pytest.mark.parametrize("n", (_BLOCK, 2 * _BLOCK + 12345, 2**17))
    def test_f32_matches_jnp(n):
        x = jax.random.uniform(jax.random.PRNGKey(0), (n,), jnp.float32)
        got = _cumsum_pallas(x, interpret=True)
        ref = jnp.cumsum(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-6, atol=1e-3
        )

    @staticmethod
    def test_i32_exact():
        x = jax.random.randint(
            jax.random.PRNGKey(1), (2 * _BLOCK,), 0, 1000, dtype=jnp.int32
        )
        got = _cumsum_pallas(x, interpret=True)
        assert bool(jnp.array_equal(got, jnp.cumsum(x)))

    @staticmethod
    def test_dispatch_falls_back_on_cpu():
        # on the CPU test backend the wrapper must use jnp.cumsum
        x = jnp.ones((_BLOCK,), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(cumsum(x)), np.arange(1, _BLOCK + 1), rtol=1e-6
        )

    @staticmethod
    def test_short_and_2d_fall_back():
        x = jnp.ones((100,), jnp.float32)
        np.testing.assert_allclose(np.asarray(cumsum(x)), np.arange(1, 101))
        x2 = jnp.ones((4, 100), jnp.float32)
        assert cumsum(x2, axis=-1).shape == (4, 100)


def test_cumsum_kernel_cross_lowers_for_tpu():
    """AOT-lower for TPU on the CPU host (catches Mosaic regressions
    without hardware)"""
    from pysdm_tpu.ops.pallas.scan import _cumsum_pallas

    x = jnp.ones((2 * _BLOCK,), jnp.float32)
    jax.export.export(
        jax.jit(lambda v: _cumsum_pallas(v, interpret=False)),
        platforms=["tpu"],
    )(x)
