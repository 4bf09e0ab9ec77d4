"""Pallas TPU kernels: single-HBM-pass inclusive cumsum.

XLA lowers ``jnp.cumsum`` on TPU to a reduce-window decomposition costing
~0.20 ms per 2^20 f32 elements (measured v5e) — ~20x the speed-of-light
single pass. Since cumsum differences are the substrate of every per-cell
segment reduction in this framework (``ops/segments.py``: collision rate
counters, condensation environment coupling, products), this kernel runs the
scan in ONE pass: the sequential TPU grid walks (BLOCK_R, 128) tiles, each
tile's 2D prefix sum is computed in VMEM with log-shift adds (lane-wise then
sublane-wise), and a scalar carry rides across grid steps in SMEM.

Replaces the reference's per-thread histogram + prefix-sum counting sort
pieces (reference ``collisions_methods.py:699-741``) at the primitive level;
no scatter, deterministic.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_R = 256  # sublanes per grid step -> 32768 elements per tile
_BLOCK = BLOCK_R * LANES


def _cumsum_kernel(x_ref, o_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.zeros((1, 1), x_ref.dtype)

    x = x_ref[...]  # (BLOCK_R, LANES), row-major == original 1D order
    zero = jnp.zeros((), x.dtype)
    # inclusive cumsum within each row (lane axis): log2(LANES) masked
    # circular rolls (pltpu.roll is the native lane-rotate; jnp.pad of the
    # sublane axis is not lowerable by Mosaic)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 1)
    k = 1
    while k < LANES:
        x = x + jnp.where(cols >= k, pltpu.roll(x, jnp.int32(k), 1), zero)
        k *= 2
    row_tot = x[:, LANES - 1 : LANES]  # (BLOCK_R, 1) per-row sums
    # inclusive cumsum of row sums down the sublane axis (broadcast to the
    # full tile width to stay in a native (sublane, lane) layout)
    rt = jnp.broadcast_to(row_tot, (BLOCK_R, LANES))
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 0)
    r = rt
    k = 1
    while k < BLOCK_R:
        r = r + jnp.where(rows >= k, pltpu.roll(r, jnp.int32(k), 0), zero)
        k *= 2
    x = x + (r - rt) + carry_ref[...]  # (1,1) carry broadcasts
    o_ref[...] = x
    carry_ref[...] = x[BLOCK_R - 1 :, LANES - 1 :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cumsum_pallas(x, interpret=False):
    n = x.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    xp = jnp.pad(x, (0, n_pad - n)) if n_pad != n else x
    grid = n_pad // _BLOCK
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(grid,),
        # NB: the column index is ``i * 0`` (not a literal 0) so that under
        # jax_enable_x64 the index map returns a uniformly-i32 tuple —
        # a mixed (i32, i64) return fails Mosaic lowering
        in_specs=[
            pl.BlockSpec(
                (BLOCK_R, LANES), lambda i: (i, i * 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_R, LANES), lambda i: (i, i * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid * BLOCK_R, LANES), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, 1), x.dtype)],
        interpret=interpret,
    )(xp.reshape(grid * BLOCK_R, LANES))
    return out.reshape(n_pad)[:n]


def _use_pallas():
    if os.environ.get("PYSDM_TPU_NO_PALLAS"):
        return False
    if os.environ.get("PYSDM_TPU_PALLAS_INTERPRET"):
        # test hook: exercise the Pallas dispatch paths on CPU via
        # interpret mode (the FakeThrustRTC analogue for kernels)
        return True
    backend = jax.default_backend()
    return backend in ("tpu", "axon")


def _interpret_mode():
    return bool(os.environ.get("PYSDM_TPU_PALLAS_INTERPRET"))


def cumsum(x, axis=-1):
    """drop-in ``jnp.cumsum`` replacement: single-pass Pallas kernel for long
    1D f32/i32/u32 arrays on TPU, ``jnp.cumsum`` otherwise. f32 summation
    order is sequential (tile-local log-shift prefix + scalar carry), so
    rounding differs from XLA's tree decomposition at the usual f32 level."""
    if (
        x.ndim == 1
        and axis in (-1, 0)
        and x.shape[0] >= _BLOCK
        and x.dtype in (jnp.float32, jnp.int32, jnp.uint32)
        and _use_pallas()
    ):
        return _cumsum_pallas(x, interpret=_interpret_mode())
    return jnp.cumsum(x, axis=axis)
