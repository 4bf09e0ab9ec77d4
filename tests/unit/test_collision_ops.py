"""Unit tests for the vectorized SDM collision ops (semantics parity with
reference ``collisions_methods.py``: coalesce multiplicity-splitting update
(45-59), compute_gamma cap (523-560), Shima eq. 20 normalization (634-650);
test model: reference ``tests/unit_tests/dynamics/collisions/test_sdm_single_cell.py``)."""

import jax.numpy as jnp
import numpy as np

from pysdm_tpu.ops import collisions as ops
from pysdm_tpu.ops import segments as seg


def _counters(n_cell):
    return {
        "collision_rate": jnp.zeros(n_cell, jnp.int64),
        "collision_rate_deficit": jnp.zeros(n_cell, jnp.float64),
        "coalescence_rate": jnp.zeros(n_cell, jnp.int64),
    }


class TestCoalesce:
    @staticmethod
    def test_basic_update():
        """xi=(5,2), gamma=2: j loses gamma*xi_k, k absorbs gamma copies of j's
        extensive attributes"""
        mult = jnp.array([5, 2], dtype=jnp.int64)
        ext = jnp.array([[10.0, 4.0]])
        gamma = jnp.array([2, 0], dtype=jnp.int64)
        is_first = jnp.array([True, False])
        cell = jnp.zeros(2, jnp.int32)
        m, e, _ = ops.coalesce(mult, ext, gamma, is_first, cell, 1, _counters(1))
        assert np.asarray(m).tolist() == [1, 2]  # 5 - 2*2 = 1
        assert np.asarray(e)[0].tolist() == [10.0, 24.0]  # 4 + 2*10

    @staticmethod
    def test_split_on_equal_removal():
        """when xi_j - gamma*xi_k == 0 the j slot is recycled: k's multiplicity
        is halved between the two slots and attributes equalized
        (reference ``collisions_methods.py:52-59``)"""
        mult = jnp.array([4, 2], dtype=jnp.int64)
        ext = jnp.array([[10.0, 4.0]])
        gamma = jnp.array([2, 0], dtype=jnp.int64)
        is_first = jnp.array([True, False])
        cell = jnp.zeros(2, jnp.int32)
        m, e, _ = ops.coalesce(mult, ext, gamma, is_first, cell, 1, _counters(1))
        assert np.asarray(m).tolist() == [1, 1]
        assert np.allclose(np.asarray(e)[0], [24.0, 24.0])

    @staticmethod
    def test_maximum_attribute_merge():
        """maximum attributes (e.g. freezing temperature) take the pairwise
        max on merge — reference-declared semantics
        (``attributes/impl/maximum_attribute.py``) left unwired there
        (TODO #594). slots: pair (0,1) collides (j=0 absorbs into k=1),
        pair (2,3) does not."""
        mult = jnp.array([5, 2, 3, 1], dtype=jnp.int64)
        ext = jnp.array([[10.0, 4.0, 1.0, 1.0]])
        mx = jnp.array([[250.0, 260.0, 240.0, 270.0]])
        gamma = jnp.array([2, 0, 0, 0], dtype=jnp.int64)
        is_first = jnp.array([True, False, True, False])
        cell = jnp.zeros(4, jnp.int32)
        m, e, _, x = ops.coalesce(
            mult, ext, gamma, is_first, cell, 1, _counters(1), max_s=mx
        )
        x = np.asarray(x)[0]
        # merged k droplet: max(250, 260) = 260; j keeps its own T_fz
        assert x.tolist() == [250.0, 260.0, 240.0, 270.0]

        # split case: xi=(4,2), gamma=2 -> both halves carry the pair max
        mult = jnp.array([4, 2], dtype=jnp.int64)
        ext = jnp.array([[10.0, 4.0]])
        mx = jnp.array([[270.0, 250.0]])
        gamma = jnp.array([2, 0], dtype=jnp.int64)
        is_first = jnp.array([True, False])
        cell = jnp.zeros(2, jnp.int32)
        m, e, _, x = ops.coalesce(
            mult, ext, gamma, is_first, cell, 1, _counters(1), max_s=mx
        )
        assert np.asarray(m).tolist() == [1, 1]
        assert np.asarray(x)[0].tolist() == [270.0, 270.0]

    @staticmethod
    def test_mass_and_number_invariants_random():
        rng = np.random.default_rng(3)
        n = 128
        mult = jnp.asarray(rng.integers(1, 1000, n), dtype=jnp.int64)
        ext = jnp.asarray(rng.uniform(1e-12, 1e-9, (2, n)))
        u = jnp.asarray(rng.uniform(size=n))
        cell = jnp.zeros(n, jnp.int32)
        alive = jnp.ones(n, dtype=bool)
        order, sorted_cell, cell_start, is_first = seg.bucket_shuffle(
            cell, alive, u, 1
        )
        mult_s = mult[order]
        ext_s = ext[:, order]
        gamma_raw = jnp.asarray(rng.integers(0, 3, n), dtype=jnp.int64)
        mj = jnp.maximum(mult_s, seg.pair_roll(mult_s))
        mk = jnp.minimum(mult_s, seg.pair_roll(mult_s))
        gamma = jnp.minimum(gamma_raw, mj // jnp.maximum(mk, 1))
        gamma = jnp.where(is_first, gamma, 0)
        m, e, _ = ops.coalesce(
            mult_s, ext_s, gamma, is_first, sorted_cell, 1, _counters(1)
        )
        # total extensive content sum(xi * ext) is exactly conserved
        before = np.asarray((mult_s.astype(ext_s.dtype) * ext_s).sum(axis=1))
        after = np.asarray((m.astype(e.dtype) * e).sum(axis=1))
        np.testing.assert_allclose(after, before, rtol=1e-12)
        assert (np.asarray(m) >= 0).all()


class TestComputeGamma:
    @staticmethod
    def test_gamma_cap_and_deficit():
        """gamma = min(ceil(prob - rand), floor(xi_j / xi_k)); excess recorded
        as collision rate deficit (reference ``collisions_methods.py:522-560``)"""
        mult = jnp.array([7, 2], dtype=jnp.int64)
        prob = jnp.array([10.0, 0.0])
        rand = jnp.array([0.5, 0.0])
        is_first = jnp.array([True, False])
        cell = jnp.zeros(2, jnp.int32)
        counters = {
            "collision_rate": jnp.zeros(1, jnp.int64),
            "collision_rate_deficit": jnp.zeros(1, jnp.float64),
        }
        gamma, counters = ops.compute_gamma(
            prob, rand, mult, cell, is_first, 1, counters
        )
        assert np.asarray(gamma).tolist() == [3, 0]  # capped at 7 // 2
        assert np.asarray(counters["collision_rate"])[0] == 3 * 2
        assert np.asarray(counters["collision_rate_deficit"])[0] == (10 - 3) * 2


class TestNormalizationFactor:
    @staticmethod
    def test_shima_eq20():
        cell_start = jnp.array([0, 5, 5, 8])  # counts 5, 0, 3
        norm = ops.normalization_factor(cell_start, 2.0, 10.0, 3, jnp.float64)
        expected = [2.0 / 10.0 * 5 * 4 / 2 / 2, 0.0, 2.0 / 10.0 * 3 * 2 / 2 / 1]
        np.testing.assert_allclose(np.asarray(norm), expected)
