"""Vectorized SDM collision ops (Shima et al. 2009).

Semantics-parity with the reference CPU kernels
(``PySDM/backends/impl_numba/methods/collisions_methods.py``), re-expressed as
branch-free vectorized updates over sorted particle slots:

- pairs are disjoint (slots (p, p+1) where ``is_first_in_pair[p]``), so the
  coalescence update is a gather -> compute -> permutation-scatter with no
  atomics; rate counters use deterministic segment sums instead of atomic adds
  (SURVEY.md §7 delta #4);
- per-pair quantities are computed at every sorted slot p (with p+1 as the
  partner) and masked by ``is_first_in_pair`` — redundant lanes are free on the
  VPU compared to the reference's pair-compaction bookkeeping.

Conventions: within a pair, ``j`` is the particle with the not-smaller
multiplicity, ``k`` the other (reference ``pair_methods.py:127-140``).
"""

import jax.numpy as jnp

from .segments import segment_sum, segment_min, pair_roll, cell_counts


def normalization_factor(cell_start, dt, dv, n_cell, dtype):
    """Shima eq. 20 norm factor per cell: dt/dv * n(n-1)/2 / floor(n/2)
    (reference ``collisions_methods.py:634-650``)"""
    sd_num = cell_counts(cell_start).astype(dtype)
    dv = jnp.asarray(dv, dtype=dtype)
    factor = dt / dv * sd_num * (sd_num - 1) / 2 / jnp.floor(sd_num / 2)
    return jnp.where(sd_num < 2, jnp.zeros((), dtype), factor)


def collision_probability(kernel_values, mult_s, sorted_cell, norm_factor, is_first):
    """prob[p] = max(xi_p, xi_{p+1}) * K * norm_factor[cell]"""
    max_mult = jnp.maximum(mult_s, pair_roll(mult_s)).astype(kernel_values.dtype)
    norm = jnp.concatenate([norm_factor, jnp.zeros((1,), norm_factor.dtype)])
    prob = max_mult * kernel_values * norm[sorted_cell]
    return jnp.where(is_first, prob, 0.0)


def scale_prob_adaptive(
    *, prob, mult_s, sorted_cell, is_first, dt_left, dt, dt_range, n_cell,
    stats_n_substep=None, stats_dt_min=None,
):
    """per-cell adaptive substep scaling
    (reference ``collisions_methods.py:330-378``): pick the largest per-cell
    substep dt_todo <= min(dt_left, dt_max) that keeps every pair's expected
    collision count ~<= multiplicity ratio, scale prob accordingly, and
    decrement dt_left."""
    ftype = prob.dtype
    mj = jnp.maximum(mult_s, pair_roll(mult_s))
    mk = jnp.minimum(mult_s, pair_roll(mult_s))
    prop = (mj // jnp.maximum(mk, 1)).astype(ftype)
    dt_optimal = dt * prop / jnp.where(prob > 0, prob, 1.0)
    dt_optimal = jnp.maximum(dt_optimal, dt_range[0])
    dt_optimal = jnp.where(is_first & (prob > 0), dt_optimal, jnp.inf)

    dt_todo = jnp.minimum(dt_left, dt_range[1])
    per_cell_opt = segment_min(dt_optimal, sorted_cell, n_cell)
    dt_todo = jnp.minimum(dt_todo, per_cell_opt)

    dt_todo_ext = jnp.concatenate([dt_todo, jnp.zeros((1,), ftype)])
    prob = prob * dt_todo_ext[sorted_cell] / dt
    new_dt_left = dt_left - dt_todo
    if stats_n_substep is not None:
        stats_n_substep = stats_n_substep + (dt_todo > 0)
    if stats_dt_min is not None:
        stats_dt_min = jnp.minimum(
            stats_dt_min, jnp.where(jnp.isinf(per_cell_opt), stats_dt_min, per_cell_opt)
        )
    return prob, new_dt_left, stats_n_substep, stats_dt_min


def compute_gamma(prob, rand, mult_s, sorted_cell, is_first, n_cell, counters=None):
    """gamma = ceil(prob - rand), capped at floor(xi_j/xi_k)
    (reference ``collisions_methods.py:522-560``); returns integer gamma per
    slot and updates collision_rate / collision_rate_deficit counters."""
    mult_dtype = mult_s.dtype
    gamma_f = jnp.maximum(jnp.ceil(prob - rand), 0.0)
    gamma_f = jnp.where(is_first, gamma_f, 0.0)
    mj = jnp.maximum(mult_s, pair_roll(mult_s))
    mk = jnp.minimum(mult_s, pair_roll(mult_s))
    prop = mj // jnp.maximum(mk, 1)
    gamma = jnp.minimum(gamma_f, prop.astype(gamma_f.dtype)).astype(mult_dtype)
    gamma = jnp.where(is_first, gamma, 0)
    if counters is not None:
        rate = gamma * mk
        deficit = (
            jnp.minimum(gamma_f, jnp.finfo(gamma_f.dtype).max).astype(gamma_f.dtype)
            - gamma.astype(gamma_f.dtype)
        ) * mk.astype(gamma_f.dtype)
        counters["collision_rate"] = counters["collision_rate"] + segment_sum(
            jnp.where(is_first, rate, 0), sorted_cell, n_cell
        )
        counters["collision_rate_deficit"] = counters[
            "collision_rate_deficit"
        ] + segment_sum(jnp.where(is_first, deficit, 0.0), sorted_cell, n_cell)
    return gamma, counters


def coalesce(mult_s, ext_s, gamma, is_first, sorted_cell, n_cell, counters=None):
    """Shima 2009 coalescence update (reference ``collisions_methods.py:45-59``):
    xi_j -= gamma * xi_k and extensive_k += gamma * extensive_j; when xi_j
    hits 0 the j-droplet is recycled by splitting k's multiplicity in half.
    Returns updated (mult_s, ext_s) in sorted-slot order."""
    ftype = ext_s.dtype
    a_m, b_m = mult_s, pair_roll(mult_s)
    a_e, b_e = ext_s, pair_roll(ext_s, axis=1)

    j_is_a = a_m >= b_m
    mj = jnp.where(j_is_a, a_m, b_m)
    mk = jnp.where(j_is_a, b_m, a_m)
    ej = jnp.where(j_is_a[None, :], a_e, b_e)
    ek = jnp.where(j_is_a[None, :], b_e, a_e)

    g = jnp.where(is_first, gamma, 0)
    gf = g.astype(ftype)
    new_n = mj - g * mk
    split = is_first & (new_n == 0) & (g > 0)

    mj_new = jnp.where(split, mk // 2, new_n)
    mk_new = jnp.where(split, mk - mk // 2, mk)
    # attributes: normal case k absorbs g copies of j; split case both equal
    ek_merged = ek + gf[None, :] * ej
    ej_new = jnp.where(split[None, :], ek_merged, ej)
    ek_new = ek_merged  # in non-split case this is the coalesce rule already

    if counters is not None:
        coal = jnp.where(is_first, g * mk, 0)
        counters["coalescence_rate"] = counters["coalescence_rate"] + segment_sum(
            coal, sorted_cell, n_cell
        )

    # map (j, k) results back to slots (p, p+1)
    a_m_new = jnp.where(j_is_a, mj_new, mk_new)
    b_m_new = jnp.where(j_is_a, mk_new, mj_new)
    a_e_new = jnp.where(j_is_a[None, :], ej_new, ek_new)
    b_e_new = jnp.where(j_is_a[None, :], ek_new, ej_new)

    mult_out = _merge_pair_results(mult_s, a_m_new, b_m_new, is_first)
    ext_out = _merge_pair_results(ext_s, a_e_new, b_e_new, is_first, axis=1)
    return mult_out, ext_out, counters


def _merge_pair_results(orig, a_new, b_new, is_first, axis=0):
    """slot p gets a_new[p] if it leads a pair, b_new[p-1] if it trails one"""
    is_first_prev = jnp.roll(is_first, 1)
    b_from_prev = jnp.roll(b_new, 1, axis=axis)
    if axis == 0:
        return jnp.where(is_first, a_new, jnp.where(is_first_prev, b_from_prev, orig))
    mask_f = is_first[None, :]
    mask_p = is_first_prev[None, :]
    return jnp.where(mask_f, a_new, jnp.where(mask_p, b_from_prev, orig))


def scatter_back(order, *sorted_arrays):
    """inverse-permutation scatter of sorted-slot arrays to particle order"""
    out = []
    for arr in sorted_arrays:
        if arr.ndim == 1:
            out.append(jnp.zeros_like(arr).at[order].set(arr))
        else:
            out.append(jnp.zeros_like(arr).at[:, order].set(arr))
    return tuple(out)
