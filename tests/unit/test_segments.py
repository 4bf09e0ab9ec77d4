"""Unit tests for the sort-based cell bucketing / croupier
(model: reference ``tests/unit_tests/dynamics/collisions/test_croupiers.py``
and ``backends/test_pair_methods``-style checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysdm_tpu.ops import segments as seg


def _mk(cell_id, alive, n_cell, seed=0):
    u01 = jax.random.uniform(jax.random.PRNGKey(seed), (len(cell_id),))
    return seg.bucket_shuffle(
        jnp.asarray(cell_id), jnp.asarray(alive), u01, n_cell
    )


class TestBucketShuffle:
    @staticmethod
    def test_order_is_permutation():
        order, *_ = _mk([2, 0, 1, 1, 0, 2, 2, 0], [True] * 8, 3)
        assert sorted(np.asarray(order).tolist()) == list(range(8))

    @staticmethod
    def test_sorted_cells_and_dead_bucket():
        cell_id = [2, 0, 1, 1, 0, 2, 2, 0]
        alive = [True, True, False, True, True, True, False, True]
        order, sorted_cell, cell_start, _ = _mk(cell_id, alive, 3)
        sc = np.asarray(sorted_cell)
        assert (np.diff(sc) >= 0).all()
        assert (sc[-2:] == 3).all()  # dead particles in trailing bucket
        cs = np.asarray(cell_start)
        assert cs.tolist() == [0, 3, 4, 6]  # counts: cell0=3, cell1=1, cell2=2

    @staticmethod
    def test_pair_flags_match_reference_semantics():
        """same cell + even offset from segment start
        (reference ``pair_methods.py:35-55``)"""
        cell_id = [0, 0, 0, 1, 1, 2]
        order, sorted_cell, cell_start, is_first = _mk(
            cell_id, [True] * 6, 3
        )
        isf = np.asarray(is_first)
        # cell 0 has 3 particles -> one pair at offset 0; cell 1 has 2 -> one
        # pair; cell 2 has 1 -> none
        assert isf.sum() == 2
        assert isf[0] and not isf[1] and not isf[2]
        assert isf[3] and not isf[4] and not isf[5]

    @staticmethod
    @pytest.mark.parametrize("n", [64])
    def test_croupier_uniformity(n):
        """sorting by i.i.d. uniform keys yields a uniform random permutation:
        each particle should appear in each slot with equal frequency"""
        counts = np.zeros((n, n))
        trials = 2000
        cell_id = jnp.zeros(n, dtype=jnp.int32)
        alive = jnp.ones(n, dtype=bool)
        key = jax.random.PRNGKey(7)
        for _ in range(trials):
            key, k = jax.random.split(key)
            u01 = jax.random.uniform(k, (n,))
            order, *_ = seg.bucket_shuffle(cell_id, alive, u01, 1)
            counts[np.arange(n), np.asarray(order)] += 1
        expected = trials / n
        chi2 = ((counts - expected) ** 2 / expected).sum()
        dof = (n - 1) ** 2
        # chi2 ~ N(dof, sqrt(2 dof)) for large dof; 5 sigma acceptance
        assert abs(chi2 - dof) < 5 * np.sqrt(2 * dof)

    @staticmethod
    def test_segment_sums_drop_dead_bucket():
        cell_id = [0, 1, 1, 0]
        alive = [True, True, False, True]
        order, sorted_cell, cell_start, _ = _mk(cell_id, alive, 2)
        vals = jnp.ones(4)
        sums = seg.segment_sum(vals, sorted_cell, 2)
        assert np.asarray(sums).tolist() == [2.0, 1.0]
