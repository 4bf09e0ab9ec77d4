"""Minimal repro for the round-3 Mosaic runtime fault: a vector-carry
``lax.while_loop`` inside a Pallas TPU kernel compiles, but raised
``UNAVAILABLE: TPU device error (kernel fault)`` at runtime when the
kernel was embedded in the large fused warm-rain program (commit
58835a9 reverted the early-exit bisection to a fixed-count fori_loop).

This script isolates the pattern at three embedding levels:

1. kernel alone (pallas_call direct)
2. kernel inside a small jit program (a few surrounding XLA ops)
3. kernel inside a larger fused program (surrounding scan + gathers,
   mimicking the multi-dynamic step shape)

Run on the TPU: ``python tools/repro_whileloop_kernel_fault.py``.
Exit status 0 with all three "ok" lines means the current jaxlib lowers
the pattern correctly and the early-exit bisection form is worth
re-evaluating (it cuts the fixed 40-iteration cost when brackets
converge early). Any "FAULT" line documents the known issue.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)  # package-global mode (see
# pysdm_tpu/__init__.py) — part of the repro: 32-bit lanes must be pinned
# explicitly inside the kernel under x64

ROWS, LANES = 64, 128


def _kernel(x_ref, o_ref):
    x = x_ref[...]
    # the round-3 pattern: element-masked early-exit bisection with VECTOR
    # carries under a scalar (any-reduce) condition
    lo = jnp.zeros_like(x)
    hi = jnp.asarray(x, jnp.float32) + jnp.float32(1.0)

    def cond(c):
        i, lo, hi = c
        # max-reduce, not jnp.any: any() itself lowers through an f64
        # squeeze under the package-global x64 mode and fails BEFORE the
        # runtime pattern can repro (that was round 3's first workaround)
        return (i < jnp.int32(50)) & (
            jnp.max(hi - lo) > jnp.float32(1e-6)
        )

    def body(c):
        i, lo, hi = c
        mid = jnp.float32(0.5) * (lo + hi)
        f = mid * mid - jnp.asarray(x, jnp.float32)
        go_lo = f > 0
        return i + jnp.int32(1), jnp.where(go_lo, lo, mid), jnp.where(
            go_lo, mid, hi
        )

    _, lo, hi = jax.lax.while_loop(
        cond, body, (jnp.int32(0), lo, hi)
    )
    o_ref[...] = jnp.float32(0.5) * (lo + hi)


def run_kernel(x):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def level1(x):
    return run_kernel(x)


@jax.jit
def level2(x):
    y = jnp.sin(x) ** 2 + 0.5
    r = run_kernel(jnp.asarray(y, jnp.float32))
    return jnp.sum(r * 2.0)


@jax.jit
def level3(x):
    # larger embedding: scan over substeps with gathers around the kernel,
    # mimicking the fused condensation substep loop shape
    idx = jnp.arange(ROWS * LANES).reshape(ROWS, LANES) % ROWS

    def sub(carry, _):
        y = carry + jnp.cos(carry)
        packed = jnp.take(y, idx[:, 0], axis=0)
        r = run_kernel(jnp.asarray(packed, jnp.float32))
        return carry * 0.99 + jnp.asarray(r, x.dtype) * 0.01, jnp.sum(r)

    out, sums = jax.lax.scan(sub, x, None, length=4)
    return jnp.sum(out) + jnp.sum(sums)


def main():
    x = jnp.abs(jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (ROWS, LANES)),
        jnp.float32,
    ))
    print("jax", jax.__version__, "device", jax.devices()[0])
    for name, fn, arg in (
        ("level1-kernel-alone", level1, x),
        ("level2-small-jit", level2, x),
        ("level3-fused-scan", level3, jnp.asarray(x, jnp.float64)),
    ):
        try:
            out = jax.block_until_ready(fn(arg))
            print(f"{name}: ok ({jnp.asarray(out).ravel()[0]:.4f})")
        except Exception as exc:  # noqa: BLE001 — the fault class varies
            print(f"{name}: FAULT {type(exc).__name__}: {str(exc)[:200]}")


if __name__ == "__main__":
    main()
