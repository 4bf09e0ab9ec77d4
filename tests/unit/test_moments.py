"""Unit tests for moment reductions (model: reference
``tests/unit_tests/backends`` moments checks)."""

import jax.numpy as jnp
import numpy as np

from pysdm_tpu.ops import moments as m


class TestMoments:
    @staticmethod
    def test_weighted_mean_per_cell():
        mult = jnp.array([1, 2, 3, 4], dtype=jnp.int64)
        attr = jnp.array([1.0, 2.0, 3.0, 4.0])
        cell = jnp.array([0, 0, 1, 1], dtype=jnp.int32)
        m0, mk = m.moments(
            multiplicity=mult,
            attr_data=attr,
            cell_id=cell,
            ranks=(1,),
            filter_attr_data=attr,
            min_x=-np.inf,
            max_x=np.inf,
            n_cell=2,
        )
        np.testing.assert_allclose(np.asarray(m0), [3.0, 7.0])
        np.testing.assert_allclose(
            np.asarray(mk)[0], [(1 + 4) / 3, (9 + 16) / 7]
        )

    @staticmethod
    def test_filter_range_excludes():
        mult = jnp.array([1, 1], dtype=jnp.int64)
        attr = jnp.array([1.0, 100.0])
        cell = jnp.zeros(2, jnp.int32)
        m0, mk = m.moments(
            multiplicity=mult,
            attr_data=attr,
            cell_id=cell,
            ranks=(1,),
            filter_attr_data=attr,
            min_x=0.0,
            max_x=10.0,
            n_cell=1,
        )
        assert np.asarray(m0)[0] == 1.0
        assert np.asarray(mk)[0, 0] == 1.0

    @staticmethod
    def test_dead_particles_vanish():
        mult = jnp.array([0, 5], dtype=jnp.int64)
        attr = jnp.array([123.0, 2.0])
        cell = jnp.zeros(2, jnp.int32)
        m0, mk = m.moments(
            multiplicity=mult,
            attr_data=attr,
            cell_id=cell,
            ranks=(1,),
            filter_attr_data=attr,
            min_x=-np.inf,
            max_x=np.inf,
            n_cell=1,
        )
        assert np.asarray(mk)[0, 0] == 2.0


class TestSpectrumMoments:
    @staticmethod
    def test_binned_counts():
        mult = jnp.array([1, 2, 4], dtype=jnp.int64)
        x = jnp.array([0.5, 1.5, 1.7])
        cell = jnp.zeros(3, jnp.int32)
        bins = jnp.array([0.0, 1.0, 2.0])
        m0, mom = m.spectrum_moments(
            multiplicity=mult,
            attr_data=x,
            x_attr=x,
            cell_id=cell,
            x_bins=bins,
            rank=1,
            n_cell=1,
        )
        np.testing.assert_allclose(np.asarray(m0)[:, 0], [1.0, 6.0])
        np.testing.assert_allclose(
            np.asarray(mom)[:, 0], [0.5, (2 * 1.5 + 4 * 1.7) / 6]
        )
