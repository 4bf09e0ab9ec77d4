"""Cell bucketing and pair finding via sorting.

TPU-first replacement (SURVEY.md §7 delta #3) for the reference's counting
sort + serial per-cell Fisher-Yates shuffle
(reference ``collisions_methods.py:588-741``, ``index_methods.py:23-44``):
one stable sort of particles by ``(cell_id, u01)`` delivers both the
cell-segment structure and a uniform random permutation within each cell
(sorting i.i.d. uniform keys induces a uniform random permutation — the
distributional equivalent of Fisher-Yates; exercised by the croupier tests).
Dead particles (multiplicity 0) sort to a trailing bucket with key ``n_cell``.

Performance notes (TPU): all index arrays are int32 (int64 gathers hit the
slow emulated path on TPU); per-cell reductions over *sorted* slots are
cumsum-differences / segmented scans — XLA lowers ``jax.ops.segment_sum``
to a serial scatter-add on TPU (~9 ms per 2^20 updates measured on v5e),
while a cumsum is a handful of fast vector passes.
"""

import jax
import jax.numpy as jnp


def bucket_shuffle(cell_id, alive, u01, n_cell):
    """sort particles by (cell, random key); returns
    order           (n_sd,) int32 — orig index of the particle at sorted slot p
    sorted_cell     (n_sd,) int32 — cell of sorted slot (n_cell for dead)
    cell_start      (n_cell+1,) int32 — segment starts; cell_start[n_cell] = n_alive
    is_first_in_pair(n_sd,) bool — slot p and p+1 form a candidate pair
    (pairing semantics per reference ``pair_methods.py:35-55``: same cell and
    even offset from the cell's segment start)
    """
    n_sd = cell_id.shape[0]
    key_cell = jnp.where(alive, cell_id, n_cell).astype(jnp.int32)
    iota = jnp.arange(n_sd, dtype=jnp.int32)
    sorted_cell, _, order = jax.lax.sort(
        (key_cell, u01, iota), num_keys=2, is_stable=False
    )
    cell_start = jnp.searchsorted(
        sorted_cell, jnp.arange(n_cell + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    offset = iota - cell_start[sorted_cell]
    same_as_next = jnp.concatenate(
        [sorted_cell[1:] == sorted_cell[:-1], jnp.zeros((1,), dtype=bool)]
    )
    is_first_in_pair = same_as_next & (offset % 2 == 0) & (sorted_cell < n_cell)
    return order, sorted_cell, cell_start, is_first_in_pair


def bucket_shuffle_payload(cell_id, alive, u01, n_cell, payloads=()):
    """like ``bucket_shuffle`` but co-sorts ``payloads`` (1D arrays of length
    n_sd) as additional variadic-sort operands. On TPU this is the fast path:
    a 2^20 gather costs ~13 ms device time (element-at-a-time) while adding a
    payload operand to the sort costs well under 1 ms. No order/iota operand
    is carried — callers that keep the state sorted never need it.
    Returns (sorted_payloads, sorted_cell, cell_start, is_first)."""
    n_sd = cell_id.shape[0]
    key_cell = jnp.where(alive, cell_id, n_cell).astype(jnp.int32)
    out = jax.lax.sort(
        (key_cell, u01) + tuple(payloads), num_keys=2, is_stable=False
    )
    sorted_cell = out[0]
    sorted_payloads = out[2:]
    cell_start = jnp.searchsorted(
        sorted_cell, jnp.arange(n_cell + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    offset = jnp.arange(n_sd, dtype=jnp.int32) - cell_start[sorted_cell]
    same_as_next = jnp.concatenate(
        [sorted_cell[1:] == sorted_cell[:-1], jnp.zeros((1,), dtype=bool)]
    )
    is_first_in_pair = same_as_next & (offset % 2 == 0) & (sorted_cell < n_cell)
    return sorted_payloads, sorted_cell, cell_start, is_first_in_pair


def bucket_shuffle_state(particles, u01, n_cell):
    """bucket-shuffle an entire ParticleState: every per-particle array rides
    the one sort as a payload operand; the returned state is in sorted slot
    order (particle order is not semantically meaningful — dynamics that sort
    keep the state sorted rather than scattering back).
    Returns (sorted_particles, sorted_cell, cell_start, is_first)."""
    rows = (
        [particles.multiplicity]
        + list(particles.extensive)
        + list(particles.maximum)
        + [particles.cell_id]
        + list(particles.cell_origin)
        + list(particles.position_in_cell)
    )
    sorted_rows, sorted_cell, cell_start, is_first = bucket_shuffle_payload(
        particles.cell_id, particles.alive, u01, n_cell, rows
    )
    sorted_particles = _rebuild_state(particles, sorted_rows)
    return sorted_particles, sorted_cell, cell_start, is_first


def sort_state_by_cell(particles, n_cell):
    """stable sort of the whole ParticleState by cell id (dead particles to a
    trailing bucket), riding all per-particle arrays as payload operands of
    one ``lax.sort``. Gives cell-segment structure for cumsum-based per-cell
    reductions (condensation env coupling, products) without any scatter.
    Returns (sorted_particles, sorted_cell, cell_start)."""
    rows = (
        [particles.multiplicity]
        + list(particles.extensive)
        + list(particles.maximum)
        + [particles.cell_id]
        + list(particles.cell_origin)
        + list(particles.position_in_cell)
    )
    key_cell = jnp.where(particles.alive, particles.cell_id, n_cell).astype(
        jnp.int32
    )
    out = jax.lax.sort((key_cell,) + tuple(rows), num_keys=1, is_stable=True)
    sorted_cell = out[0]
    cell_start = jnp.searchsorted(
        sorted_cell, jnp.arange(n_cell + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    sorted_particles = _rebuild_state(particles, out[1:])
    return sorted_particles, sorted_cell, cell_start


def _rebuild_state(particles, sorted_rows):
    n_ext = particles.extensive.shape[0]
    n_max = particles.maximum.shape[0]
    n_dim = particles.cell_origin.shape[0]
    i = 0
    mult = sorted_rows[i]; i += 1
    ext = jnp.stack(sorted_rows[i : i + n_ext]) if n_ext else particles.extensive
    i += n_ext
    mx = jnp.stack(sorted_rows[i : i + n_max]) if n_max else particles.maximum
    i += n_max
    cid = sorted_rows[i]; i += 1
    corig = (
        jnp.stack(sorted_rows[i : i + n_dim]) if n_dim else particles.cell_origin
    )
    i += n_dim
    pic = (
        jnp.stack(sorted_rows[i : i + n_dim])
        if n_dim
        else particles.position_in_cell
    )
    return particles.replace(
        multiplicity=mult,
        extensive=ext,
        maximum=mx,
        cell_id=cid,
        cell_origin=corig,
        position_in_cell=pic,
    )


def sorted_segment_sum(values, cell_start, n_cell):
    """per-cell sum over slots sorted by cell, as a cumsum difference
    (deterministic, no scatter): sum_i = csum[cell_start[i+1]] - csum[cell_start[i]].
    Exact for integer dtypes; for floats the error is that of a length-n
    cumsum (fine for rate counters; use matmul/one-hot for tighter sums)."""
    c = jnp.cumsum(values, axis=-1)
    cpad = jnp.concatenate([jnp.zeros(c.shape[:-1] + (1,), c.dtype), c], axis=-1)
    return cpad[..., cell_start[1 : n_cell + 1]] - cpad[..., cell_start[:n_cell]]


def _segmented_scan(combine_val, values, is_start, reverse=False):
    """generic segmented inclusive scan: resets at segment starts"""

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, combine_val(av, bv))

    flags, scanned = jax.lax.associative_scan(
        combine, (is_start, values), reverse=reverse
    )
    del flags
    return scanned


def sorted_segment_min(values, sorted_cell, cell_start, n_cell):
    """per-cell min over sorted slots via a segmented scan (no scatter).
    Empty cells get +inf (the reduction identity)."""
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]]
    )
    scanned = _segmented_scan(jnp.minimum, values, is_start)
    ends = cell_start[1 : n_cell + 1] - 1
    mins = scanned[jnp.clip(ends, 0)]
    empty = cell_start[1 : n_cell + 1] == cell_start[:n_cell]
    return jnp.where(empty, jnp.array(jnp.inf, values.dtype), mins)


def sorted_segment_max(values, sorted_cell, cell_start, n_cell):
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]]
    )
    scanned = _segmented_scan(jnp.maximum, values, is_start)
    ends = cell_start[1 : n_cell + 1] - 1
    maxs = scanned[jnp.clip(ends, 0)]
    empty = cell_start[1 : n_cell + 1] == cell_start[:n_cell]
    return jnp.where(empty, jnp.array(-jnp.inf, values.dtype), maxs)


def segment_sum(values, sorted_cell, n_cell):
    """deterministic per-cell sum over sorted slots (dead bucket dropped).
    NOTE: scatter-based; prefer ``sorted_segment_sum`` in per-step code."""
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
