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


@pytest.mark.parametrize("seed", (3,))
def test_fused_multirow_matches_xla(seed):
    """R=3 extensive rows (the 2D warm-rain attribute block) through the
    fused kernel vs the XLA reference ops"""
    n = 4096
    mult, ext, sorted_cell, is_first, kern, rand = _mk_case(n, seed, True)
    rng = np.random.default_rng(seed + 100)
    ext3 = jnp.asarray(
        rng.uniform(1e-12, 1e-9, size=(3, n)).astype(np.float32)
    )
    n_cell = 1
    cell_start = jnp.searchsorted(
        sorted_cell, jnp.arange(n_cell + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    prob = coll_ops.collision_probability(
        kern, mult, sorted_cell, jnp.ones((n_cell,), jnp.float32), is_first
    )
    gamma, _ = coll_ops.compute_gamma(
        prob, rand, mult, sorted_cell, is_first, n_cell, None,
        cell_start=cell_start,
    )
    mult_ref, ext_ref, _ = coll_ops.coalesce(
        mult, ext3, gamma, is_first, sorted_cell, n_cell, None,
        cell_start=cell_start,
    )

    kernnorm = jnp.where(is_first, kern, 0.0)
    mult_new, ext_new, *_ = fused_coalesce(
        mult, ext3, kernnorm, rand, is_first, interpret=True
    )
    assert ext_new.shape == (3, n)
    np.testing.assert_array_equal(np.asarray(mult_new), np.asarray(mult_ref))
    np.testing.assert_allclose(
        np.asarray(ext_new), np.asarray(ext_ref), rtol=1e-6
    )


def _run_box(n_steps, adaptive, n_sd=2**12, seed=44):
    from pysdm_tpu import Builder, Formulae
    from pysdm_tpu.backends import CPU
    from pysdm_tpu.dynamics import Coalescence
    from pysdm_tpu.dynamics.collisions.collision_kernels import Golovin
    from pysdm_tpu.environments import Box
    from pysdm_tpu.initialisation.sampling.spectral_sampling import (
        ConstantMultiplicity,
    )
    from pysdm_tpu.initialisation.spectra import Exponential

    formulae = Formulae(seed=seed)
    builder = Builder(
        n_sd=n_sd, backend=CPU(formulae), environment=Box(dv=1e6, dt=1.0)
    )
    x_0 = float(formulae.trivia.volume(radius=30.531e-6))
    builder.add_dynamic(
        Coalescence(collision_kernel=Golovin(b=1.5e3), adaptive=adaptive)
    )
    attributes = {}
    attributes["volume"], attributes["multiplicity"] = ConstantMultiplicity(
        Exponential(norm_factor=(2**23) * 1e6, scale=x_0)
    ).sample(n_sd)
    p = builder.build(attributes)
    p.run(n_steps)
    p.block_until_ready()
    return p


@pytest.mark.parametrize("adaptive", (False, True))
def test_dispatch_fused_vs_xla_full_sim(adaptive, monkeypatch):
    """the Collision dynamic's fused-dispatch path (incl. the adaptive
    while_loop) vs the XLA path on the same RNG stream — interpret mode
    stands in for the TPU (CPU analogue of the reference's FakeThrustRTC)"""
    p_xla = _run_box(5, adaptive)
    monkeypatch.setenv("PYSDM_TPU_PALLAS_INTERPRET", "1")
    p_fused = _run_box(5, adaptive)
    monkeypatch.delenv("PYSDM_TPU_PALLAS_INTERPRET")

    m_xla = np.asarray(p_xla.attributes["multiplicity"], dtype=np.float64)
    m_fused = np.asarray(p_fused.attributes["multiplicity"], dtype=np.float64)
    w_xla = np.asarray(p_xla.attributes["water mass"], dtype=np.float64)
    w_fused = np.asarray(p_fused.attributes["water mass"], dtype=np.float64)
    # identical u01 streams -> identical collision outcomes up to f32
    # multiplication-order ULP flips of ceil(prob - rand)
    same = m_xla == m_fused
    assert same.mean() > 0.999
    np.testing.assert_allclose(
        (m_fused * w_fused).sum(), (m_xla * w_xla).sum(), rtol=1e-9
    )
    np.testing.assert_allclose(m_fused.sum(), m_xla.sum(), rtol=1e-3)


@pytest.mark.parametrize("big", (False, True))
@pytest.mark.parametrize("seed", (1, 9))
def test_fused_mirror_matches_xla(big, seed):
    """mirror-croupier fused kernel (``fused_coalesce_mirror``) vs the XLA
    mirror-pairing ops on randomized single-cell states with dead slots"""
    from pysdm_tpu.ops.pairing import MirrorPairing

    n = 4096
    rng = np.random.default_rng(seed)
    mult = rng.integers(1, 2**40 if big else 1000, size=n).astype(np.int64)
    dead = rng.uniform(size=n) < 0.05
    mult[dead] = 0
    ext = jnp.asarray(
        rng.uniform(1e-12, 1e-9, size=(2, n)).astype(np.float32)
    )
    mult = jnp.asarray(mult)
    kern = jnp.asarray(rng.uniform(0.0, 3.0, size=n).astype(np.float32))
    rand = jnp.asarray(rng.uniform(0, 1, size=n).astype(np.float32))
    K = int(rng.integers(0, n))
    pairing = MirrorPairing(K, n, mult > 0)
    is_first = pairing.is_first

    # XLA mirror path
    prob = coll_ops.collision_probability(
        kern, mult, None, jnp.ones((1,), jnp.float32), is_first,
        pairing=pairing,
    )
    gamma, _ = coll_ops.compute_gamma(
        prob, rand, mult, None, is_first, 1, None, pairing=pairing
    )
    mult_ref, ext_ref, _ = coll_ops.coalesce(
        mult, ext, gamma, is_first, None, 1, None, pairing=pairing
    )

    from pysdm_tpu.ops.pallas.collision import fused_coalesce_mirror

    mult_new, ext_new, rate, deficit, coal = fused_coalesce_mirror(
        mult, ext, kern, rand, is_first, pairing.shift, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(mult_new), np.asarray(mult_ref))
    np.testing.assert_allclose(
        np.asarray(ext_new), np.asarray(ext_ref), rtol=1e-6
    )
    mk = jnp.minimum(mult, pairing.partner(mult)).astype(jnp.float32)
    expect_rate = np.where(
        np.asarray(is_first),
        np.asarray(gamma, dtype=np.float32) * np.asarray(mk),
        0.0,
    )
    np.testing.assert_allclose(np.asarray(rate), expect_rate, rtol=1e-5)
    assert (np.asarray(deficit) >= 0).all()
    # totals conserved
    np.testing.assert_allclose(
        np.asarray(
            (mult_new.astype(jnp.float64) * ext_new.astype(jnp.float64)).sum(
                axis=1
            )
        ),
        np.asarray(
            (mult.astype(jnp.float64) * ext.astype(jnp.float64)).sum(axis=1)
        ),
        rtol=1e-6,
    )
