"""Statistical-moment reductions over particles.

Deterministic segment-sum replacements for the reference's atomic-add moment
kernels (reference ``PySDM/backends/impl_numba/methods/moments_methods.py``).
Dead particles carry multiplicity 0 and therefore vanish from every sum —
no index/permutation filtering is needed.
"""

import jax
import jax.numpy as jnp


def moments(
    *,
    multiplicity,
    attr_data,  # (n_ranks? no - single attr) (n_sd,)
    cell_id,
    ranks,  # tuple of python numbers (static)
    filter_attr_data,
    min_x,
    max_x,
    n_cell,
    weighting_attribute=None,
    weighting_rank=0,
    skip_division_by_m0=False,
):
    """per-cell weighted moments of `attr_data` for particles with
    min_x <= filter_attr_data < max_x; returns (moment_0[n_cell],
    moments[n_ranks, n_cell])"""
    ftype = attr_data.dtype
    in_range = (filter_attr_data >= min_x) & (filter_attr_data < max_x)
    if weighting_rank == 0 or weighting_attribute is None:
        weight = multiplicity.astype(ftype)
    else:
        weight = multiplicity.astype(ftype) * weighting_attribute**weighting_rank
    weight = jnp.where(in_range, weight, 0.0)
    m0 = jax.ops.segment_sum(weight, cell_id, num_segments=n_cell)
    mk = []
    for rank in ranks:
        vals = weight * attr_data**rank if rank != 0 else weight
        mk.append(jax.ops.segment_sum(vals, cell_id, num_segments=n_cell))
    mks = jnp.stack(mk)
    if not skip_division_by_m0:
        mks = jnp.where(m0[None, :] != 0, mks / jnp.where(m0 == 0, 1.0, m0)[None, :], 0.0)
    return m0, mks


def spectrum_moments(
    *,
    multiplicity,
    attr_data,
    x_attr,
    cell_id,
    x_bins,  # (n_bins+1,)
    rank,
    n_cell,
    weighting_attribute=None,
    weighting_rank=0,
):
    """per-(bin, cell) weighted moments; returns (moment_0, moments) each of
    shape (n_bins, n_cell) with moments normalized by per-bin moment_0"""
    ftype = attr_data.dtype
    n_bins = x_bins.shape[0] - 1
    k = jnp.searchsorted(x_bins, x_attr, side="right") - 1
    valid = (k >= 0) & (k < n_bins)
    if weighting_rank == 0 or weighting_attribute is None:
        weight = multiplicity.astype(ftype)
    else:
        weight = multiplicity.astype(ftype) * weighting_attribute**weighting_rank
    weight = jnp.where(valid, weight, 0.0)
    seg = jnp.where(valid, k, 0) * n_cell + cell_id
    m0 = jax.ops.segment_sum(weight, seg, num_segments=n_bins * n_cell)
    m1 = jax.ops.segment_sum(
        weight * attr_data**rank if rank != 0 else weight,
        seg,
        num_segments=n_bins * n_cell,
    )
    m0 = m0.reshape(n_bins, n_cell)
    m1 = m1.reshape(n_bins, n_cell)
    mom = jnp.where(m0 != 0, m1 / jnp.where(m0 == 0, 1.0, m0), 0.0)
    return m0, mom
