"""Fused Pallas coalescence kernel (``ops/pallas/collision.py``) vs the XLA
reference ops (``ops/collisions.py``) on randomized sorted states, including
multiplicities above 2^32 and exhaustion/split cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysdm_tpu.ops import collisions as coll_ops
from pysdm_tpu.ops.pallas.collision import fused_coalesce
from pysdm_tpu.ops.segments import pair_roll


def _mk_case(n, seed, big):
    rng = np.random.default_rng(seed)
    mult = rng.integers(1, 2**40 if big else 1000, size=n).astype(np.int64)
    ext = rng.uniform(1e-12, 1e-9, size=n).astype(np.float32)
    cell = np.zeros(n, np.int32)
    # emulate a sorted single-cell state with a few dead slots at the end
    n_dead = n // 16
    mult[-n_dead:] = 0
    sorted_cell = np.where(mult > 0, 0, 1).astype(np.int32)
    n_alive = n - n_dead
    is_first = np.zeros(n, bool)
    is_first[: n_alive - (n_alive % 2) : 2] = True
    if n_alive % 2 == 0 and n_alive >= 2:
        is_first[n_alive - 2] = True
    kern = rng.uniform(0.0, 3.0, size=n).astype(np.float32)
    rand = rng.uniform(0, 1, size=n).astype(np.float32)
    return (
        jnp.asarray(mult), jnp.asarray(ext), jnp.asarray(sorted_cell),
        jnp.asarray(is_first), jnp.asarray(kern), jnp.asarray(rand),
    )


@pytest.mark.parametrize("big", (False, True))
@pytest.mark.parametrize("seed", (0, 7))
def test_fused_matches_xla(big, seed):
    n = 4096
    mult, ext, sorted_cell, is_first, kern, rand = _mk_case(n, seed, big)
    n_cell = 1
    cell_start = jnp.searchsorted(
        sorted_cell, jnp.arange(n_cell + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # XLA reference path
    prob = coll_ops.collision_probability(
        kern, mult, sorted_cell, jnp.ones((n_cell,), jnp.float32), is_first
    )
    gamma, _ = coll_ops.compute_gamma(
        prob, rand, mult, sorted_cell, is_first, n_cell, None,
        cell_start=cell_start,
    )
    mult_ref, ext_ref, _ = coll_ops.coalesce(
        mult, ext[None, :], gamma, is_first, sorted_cell, n_cell, None,
        cell_start=cell_start,
    )

    # fused kernel (interpret mode on CPU)
    kernnorm = jnp.where(is_first, kern, 0.0)
    mult_new, ext_new, rate, deficit, coal = fused_coalesce(
        mult, ext, kernnorm, rand, is_first, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(mult_new), np.asarray(mult_ref))
    np.testing.assert_allclose(
        np.asarray(ext_new), np.asarray(ext_ref[0]), rtol=1e-6
    )
    # rate contributions: gamma * min-multiplicity at leader slots
    mk = jnp.minimum(mult, pair_roll(mult)).astype(jnp.float32)
    expect_rate = np.where(
        np.asarray(is_first),
        np.asarray(gamma, dtype=np.float32) * np.asarray(mk),
        0.0,
    )
    np.testing.assert_allclose(np.asarray(rate), expect_rate, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(coal), expect_rate, rtol=1e-5)
    assert (np.asarray(deficit) >= 0).all()


def test_mass_conserved_and_split():
    # force exhaustion: equal multiplicities, large kernel -> gamma caps at 1
    n = 256
    mult = jnp.full((n,), 7, jnp.int64)
    ext = jnp.ones((n,), jnp.float32)
    is_first = jnp.asarray(np.arange(n) % 2 == 0)
    kern = jnp.full((n,), 100.0, jnp.float32)
    rand = jnp.full((n,), 0.5, jnp.float32)
    mult_new, ext_new, *_ = fused_coalesce(
        mult, ext, kern, rand, is_first, interpret=True
    )
    total0 = float((np.asarray(mult) * np.asarray(ext)).sum())
    total1 = float((np.asarray(mult_new) * np.asarray(ext_new)).sum())
    np.testing.assert_allclose(total1, total0, rtol=1e-6)
    # gamma = floor(7/7) = 1 -> new_n = 0 -> split: 7 -> 3 + 4
    m = np.asarray(mult_new)
    assert set(m[::2]) == {3} and set(m[1::2]) == {4}
