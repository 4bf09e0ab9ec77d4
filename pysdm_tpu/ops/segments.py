"""Cell bucketing and pair finding via sorting.

TPU-first replacement (SURVEY.md §7 delta #3) for the reference's counting
sort + serial per-cell Fisher-Yates shuffle
(reference ``collisions_methods.py:588-741``, ``index_methods.py:23-44``):
one stable sort of particles by ``(cell_id, u01)`` delivers both the
cell-segment structure and a uniform random permutation within each cell
(sorting i.i.d. uniform keys induces a uniform random permutation — the
distributional equivalent of Fisher-Yates; exercised by the croupier tests).
Dead particles (multiplicity 0) sort to a trailing bucket with key ``n_cell``.
"""

import jax
import jax.numpy as jnp


def bucket_shuffle(cell_id, alive, u01, n_cell):
    """sort particles by (cell, random key); returns
    order           (n_sd,) int  — orig index of the particle at sorted slot p
    sorted_cell     (n_sd,) int  — cell of sorted slot (n_cell for dead)
    cell_start      (n_cell+1,) int — segment starts; cell_start[n_cell] = n_alive
    is_first_in_pair(n_sd,) bool — slot p and p+1 form a candidate pair
    (pairing semantics per reference ``pair_methods.py:35-55``: same cell and
    even offset from the cell's segment start)
    """
    n_sd = cell_id.shape[0]
    key_cell = jnp.where(alive, cell_id, n_cell).astype(jnp.int32)
    order = jnp.lexsort((u01, key_cell))
    sorted_cell = key_cell[order]
    cell_start = jnp.searchsorted(
        sorted_cell, jnp.arange(n_cell + 1, dtype=sorted_cell.dtype), side="left"
    )
    offset = jnp.arange(n_sd) - cell_start[sorted_cell]
    same_as_next = jnp.concatenate(
        [sorted_cell[1:] == sorted_cell[:-1], jnp.zeros((1,), dtype=bool)]
    )
    is_first_in_pair = same_as_next & (offset % 2 == 0) & (sorted_cell < n_cell)
    return order, sorted_cell, cell_start, is_first_in_pair


def segment_sum(values, sorted_cell, n_cell):
    """deterministic per-cell sum over sorted slots (dead bucket dropped)"""
    return jax.ops.segment_sum(
        values, sorted_cell, num_segments=n_cell + 1, indices_are_sorted=True
    )[:n_cell]


def segment_min(values, sorted_cell, n_cell):
    return jax.ops.segment_min(
        values, sorted_cell, num_segments=n_cell + 1, indices_are_sorted=True
    )[:n_cell]


def segment_max(values, sorted_cell, n_cell):
    return jax.ops.segment_max(
        values, sorted_cell, num_segments=n_cell + 1, indices_are_sorted=True
    )[:n_cell]


def cell_counts(cell_start):
    return jnp.diff(cell_start)


def pair_roll(x, axis=0):
    """value at slot p+1 (garbage at the last slot — always masked by
    is_first_in_pair, which is False there)"""
    return jnp.roll(x, -1, axis=axis)
