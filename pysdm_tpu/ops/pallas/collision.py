"""Pallas TPU kernel: fused SDM coalescence update.

Fuses the post-shuffle collision pipeline — pair probability, gamma draw
capping, the Shima-2009 multiplicity-splitting update and per-slot rate
contributions — into ONE pass over the sorted particle state. The XLA
formulation materializes ~15 intermediate arrays (pair rolls, 64-bit
emulation temporaries), costing ~1.1 ms per 2^20 super-droplets on v5e;
this kernel reads each row once (plus pre-rolled neighbor copies) and
writes the updated state once.

Design notes:
- Pair access is made slot-local: every slot receives its neighbors' values
  via XLA-precomputed roll(+1)/roll(-1) copies, and BOTH pair members
  recompute the pair's arithmetic redundantly (VPU lanes are free; HBM
  passes are not). Semantics mirror ``ops/collisions.py``:
  ``collision_probability`` + ``compute_gamma`` + ``coalesce``.
- int64 multiplicities are carried as (hi, lo) u32 word pairs; the kernel
  implements the needed 64-bit ops (compare, add/sub with carry, and
  small x 64 multiply via 16-bit limbs) on u32 lanes — Mosaic has no
  64-bit vector path.
- gamma = min(ceil(prob - rand), floor(mj/mk)) uses the f32-estimate +
  multiply-compare walk of ``ops.collisions.capped_floor_div`` (no 64-bit
  divide exists on the VPU either).

Reference semantics: ``collisions_methods.py:45-59`` (coalesce),
``:522-560`` (compute_gamma); see SURVEY.md §7 delta #4.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_R = 256
_BLOCK = BLOCK_R * LANES

_TWO32 = 4294967296.0  # python float: a jnp constant would be captured
# by the kernel closure, which pallas_call rejects


def _u64_ge(a_hi, a_lo, b_hi, b_lo):
    return (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))


def _u64_sub(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo - b_lo
    borrow = (a_lo < b_lo).astype(jnp.uint32)
    hi = a_hi - b_hi - borrow
    return hi, lo


def _u64_add(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint32)
    hi = a_hi + b_hi + carry
    return hi, lo


def _u32_mul_wide(a, b):
    """full 32x32 -> 64-bit product via 16-bit limbs (no vector mulhi)"""
    mask = jnp.uint32(0xFFFF)
    a0, a1 = a & mask, a >> 16
    b0, b1 = b & mask, b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & mask) + (p10 & mask)
    lo = (p00 & mask) | (mid << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _u64_mul_u32(g, b_hi, b_lo):
    """g (u32) * 64-bit (b_hi, b_lo); result taken mod 2^64 (callers
    guarantee g*b <= mj < 2^63)"""
    hi, lo = _u32_mul_wide(g, b_lo)
    hi = hi + g * b_hi  # wrap-around fine within the guarantee
    return hi, lo


def _u32_to_f32(x):
    """Mosaic has no u32->f32 cast: go through i32 on halves (x>>1 < 2^31)"""
    return (
        (x >> 1).astype(jnp.int32).astype(jnp.float32) * jnp.float32(2.0)
        + (x & jnp.uint32(1)).astype(jnp.int32).astype(jnp.float32)
    )


def _u64_to_f32(hi, lo):
    return _u32_to_f32(hi) * jnp.float32(_TWO32) + _u32_to_f32(lo)


def _u64_half(hi, lo):
    return hi >> 1, (lo >> 1) | (hi << 31)


def _coalesce_kernel(
    # inputs ((BLOCK_R, LANES); ext rows (R, BLOCK_R, LANES)):
    mhi_ref, mlo_ref,          # own multiplicity words
    mhi_nx_ref, mlo_nx_ref,    # partner-if-leader (roll -1)
    mhi_pv_ref, mlo_pv_ref,    # partner-if-trailer (roll +1)
    ext_ref, ext_nx_ref, ext_pv_ref,   # R extensive rows
    kn_ref,                    # kernel value x norm x prob_scale at leader
    kn_pv_ref,                 # same, roll +1 (the pair's leader slot)
    rand_ref, rand_pv_ref,     # gamma u01 at leader slot (and rolled)
    isf_ref, isf_pv_ref,       # is_first, is_first_prev (int32 0/1)
    # outputs:
    mhi_out_ref, mlo_out_ref, ext_out_ref,
    rate_ref, deficit_ref, coal_ref,
):
    one = jnp.uint32(1)
    isf = isf_ref[...] != 0
    isf_pv = isf_pv_ref[...] != 0

    # select this slot's pair orientation: leader pairs with next,
    # trailer with prev; untouched slots keep their values
    a_hi, a_lo = mhi_ref[...], mlo_ref[...]
    lead_bhi, lead_blo = mhi_nx_ref[...], mlo_nx_ref[...]
    trail_bhi, trail_blo = mhi_pv_ref[...], mlo_pv_ref[...]
    b_hi = jnp.where(isf, lead_bhi, trail_bhi)
    b_lo = jnp.where(isf, lead_blo, trail_blo)
    in_pair = isf | isf_pv

    # j = not-smaller multiplicity, k = the other; ties go to the pair
    # LEADER (reference ``coalesce``: j_is_a with a = leader slot), so a
    # trailer is j only on strict inequality
    # (boolean select via logical ops: Mosaic cannot lower select_n on i1)
    a_is_j = (isf & _u64_ge(a_hi, a_lo, b_hi, b_lo)) | (
        (~isf) & (~_u64_ge(b_hi, b_lo, a_hi, a_lo))
    )
    mj_hi = jnp.where(a_is_j, a_hi, b_hi)
    mj_lo = jnp.where(a_is_j, a_lo, b_lo)
    mk_hi = jnp.where(a_is_j, b_hi, a_hi)
    mk_lo = jnp.where(a_is_j, b_lo, a_lo)
    # guard mk >= 1 for the division estimate (dead partners have mult 0)
    mk1_lo = jnp.where((mk_hi == 0) & (mk_lo == 0), one, mk_lo)

    # pair probability and raw gamma (f32): prob = max_mult * K * norm
    kn = jnp.where(isf, kn_ref[...], kn_pv_ref[...])
    rand = jnp.where(isf, rand_ref[...], rand_pv_ref[...])
    prob = _u64_to_f32(mj_hi, mj_lo) * kn
    gamma_f = jnp.maximum(jnp.ceil(prob - rand), jnp.float32(0.0))
    gamma_f = jnp.where(in_pair, gamma_f, jnp.float32(0.0))

    # gamma = min(gamma_f, floor(mj/mk)): f32 estimate + exact walk
    q_est = jnp.floor(
        _u64_to_f32(mj_hi, mj_lo) / _u64_to_f32(mk_hi, mk1_lo)
    )
    # f32 -> u32 via i32 (values are capped far below 2^31; Mosaic has no
    # direct f32->u32 cast). Clamp to the i32-exact range first.
    big = jnp.float32(2**31 - 128)
    g_f = jnp.clip(jnp.minimum(q_est, gamma_f), jnp.float32(0.0), big)
    g = g_f.astype(jnp.int32).astype(jnp.uint32)
    cap = jnp.clip(gamma_f, jnp.float32(0.0), big).astype(jnp.int32).astype(jnp.uint32)
    for _ in range(5):
        p_hi, p_lo = _u64_mul_u32(g, mk_hi, mk1_lo)
        too_big = ~_u64_ge(mj_hi, mj_lo, p_hi, p_lo)  # g*mk > mj
        g = jnp.where(too_big, g - 1, g)
    for _ in range(5):
        p_hi, p_lo = _u64_mul_u32(g + 1, mk_hi, mk1_lo)
        fits = _u64_ge(mj_hi, mj_lo, p_hi, p_lo) & (g + 1 <= cap)
        g = jnp.where(fits, g + 1, g)
    g = jnp.where(in_pair, g, jnp.uint32(0))
    gf = _u32_to_f32(g)

    # Shima update: xi_j -= gamma*xi_k; extensive_k += gamma*extensive_j;
    # j exhausted (new_n == 0) -> split k's multiplicity in half
    gmk_hi, gmk_lo = _u64_mul_u32(g, mk_hi, mk_lo)
    nn_hi, nn_lo = _u64_sub(mj_hi, mj_lo, gmk_hi, gmk_lo)
    split = in_pair & (nn_hi == 0) & (nn_lo == 0) & (g > 0)
    h_hi, h_lo = _u64_half(mk_hi, mk_lo)       # floor(mk/2)
    r_hi, r_lo = _u64_sub(mk_hi, mk_lo, h_hi, h_lo)  # mk - floor(mk/2)
    mj_new_hi = jnp.where(split, h_hi, nn_hi)
    mj_new_lo = jnp.where(split, h_lo, nn_lo)
    mk_new_hi = jnp.where(split, r_hi, mk_hi)
    mk_new_lo = jnp.where(split, r_lo, mk_lo)
    i_am_j = in_pair & a_is_j
    out_hi = jnp.where(
        in_pair,
        jnp.where(i_am_j, mj_new_hi, mk_new_hi),
        a_hi,
    )
    out_lo = jnp.where(
        in_pair,
        jnp.where(i_am_j, mj_new_lo, mk_new_lo),
        a_lo,
    )
    mhi_out_ref[...] = out_hi
    mlo_out_ref[...] = out_lo

    # extensive rows: ek_merged = ek + gamma * ej; split -> both get merged
    # (static unroll over the R conserved rows — same g/split for every row)
    for r in range(ext_ref.shape[0]):
        e_own = ext_ref[r]
        e_other = jnp.where(isf, ext_nx_ref[r], ext_pv_ref[r])
        ej = jnp.where(i_am_j, e_own, e_other)
        ek_merged = jnp.where(i_am_j, e_other, e_own) + gf * ej
        e_new = jnp.where(
            i_am_j,
            jnp.where(split, ek_merged, ej),  # j keeps ej unless split
            ek_merged,
        )
        ext_out_ref[r] = jnp.where(in_pair, e_new, e_own)

    # per-slot rate contributions at leader slots only (segment-summed by
    # the caller; reference atomic counters -> deterministic sums)
    mk_f = _u64_to_f32(mk_hi, mk_lo)
    lead = isf
    rate_ref[...] = jnp.where(lead, gf * mk_f, jnp.float32(0.0))
    deficit_ref[...] = jnp.where(lead, (gamma_f - gf) * mk_f, jnp.float32(0.0))
    coal_ref[...] = jnp.where(lead, gf * mk_f, jnp.float32(0.0))


def _coalesce_kernel_mirror(
    # inputs ((BLOCK_R, LANES); ext rows (R, BLOCK_R, LANES)):
    mhi_ref, mlo_ref,          # own multiplicity words
    bhi_ref, blo_ref,          # partner multiplicity words (involution)
    ext_ref, ext_p_ref,        # R extensive rows, own + partner
    kn_ref, kn_p_ref,          # kernel*norm*scale, own + partner
    rand_ref, rand_p_ref,      # gamma u01, own + partner
    isf_ref, isf_p_ref,        # is_first, partner's is_first (int32 0/1)
    # outputs:
    mhi_out_ref, mlo_out_ref, ext_out_ref,
    rate_ref, deficit_ref, coal_ref,
):
    """mirror-croupier variant of ``_coalesce_kernel``: the matching is an
    involution (ops/pairing.py MirrorPairing), so ONE partner set serves both
    pair orientations and every slot writes its own final value — no
    XLA-side merge pass. Pair roles and update math are identical to the
    adjacency kernel (reference ``collisions_methods.py:45-59,522-560``)."""
    isf = isf_ref[...] != 0
    isfp = isf_p_ref[...] != 0

    a_hi, a_lo = mhi_ref[...], mlo_ref[...]
    b_hi, b_lo = bhi_ref[...], blo_ref[...]
    in_pair = isf | isfp

    # j = not-smaller multiplicity; ties go to the pair LEADER (isf slot)
    a_is_j = (isf & _u64_ge(a_hi, a_lo, b_hi, b_lo)) | (
        (~isf) & (~_u64_ge(b_hi, b_lo, a_hi, a_lo))
    )
    mj_hi = jnp.where(a_is_j, a_hi, b_hi)
    mj_lo = jnp.where(a_is_j, a_lo, b_lo)
    mk_hi = jnp.where(a_is_j, b_hi, a_hi)
    mk_lo = jnp.where(a_is_j, b_lo, a_lo)
    one = jnp.uint32(1)
    mk1_lo = jnp.where((mk_hi == 0) & (mk_lo == 0), one, mk_lo)

    # the pair's leader supplies kn and the gamma draw
    kn = jnp.where(isf, kn_ref[...], kn_p_ref[...])
    rand = jnp.where(isf, rand_ref[...], rand_p_ref[...])
    prob = _u64_to_f32(mj_hi, mj_lo) * kn
    gamma_f = jnp.maximum(jnp.ceil(prob - rand), jnp.float32(0.0))
    gamma_f = jnp.where(in_pair, gamma_f, jnp.float32(0.0))

    q_est = jnp.floor(
        _u64_to_f32(mj_hi, mj_lo) / _u64_to_f32(mk_hi, mk1_lo)
    )
    big = jnp.float32(2**31 - 128)
    g_f = jnp.clip(jnp.minimum(q_est, gamma_f), jnp.float32(0.0), big)
    g = g_f.astype(jnp.int32).astype(jnp.uint32)
    cap = jnp.clip(gamma_f, jnp.float32(0.0), big).astype(jnp.int32).astype(jnp.uint32)
    for _ in range(5):
        p_hi, p_lo = _u64_mul_u32(g, mk_hi, mk1_lo)
        too_big = ~_u64_ge(mj_hi, mj_lo, p_hi, p_lo)
        g = jnp.where(too_big, g - 1, g)
    for _ in range(5):
        p_hi, p_lo = _u64_mul_u32(g + 1, mk_hi, mk1_lo)
        fits = _u64_ge(mj_hi, mj_lo, p_hi, p_lo) & (g + 1 <= cap)
        g = jnp.where(fits, g + 1, g)
    g = jnp.where(in_pair, g, jnp.uint32(0))
    gf = _u32_to_f32(g)

    gmk_hi, gmk_lo = _u64_mul_u32(g, mk_hi, mk_lo)
    nn_hi, nn_lo = _u64_sub(mj_hi, mj_lo, gmk_hi, gmk_lo)
    split = in_pair & (nn_hi == 0) & (nn_lo == 0) & (g > 0)
    h_hi, h_lo = _u64_half(mk_hi, mk_lo)
    r_hi, r_lo = _u64_sub(mk_hi, mk_lo, h_hi, h_lo)
    mj_new_hi = jnp.where(split, h_hi, nn_hi)
    mj_new_lo = jnp.where(split, h_lo, nn_lo)
    mk_new_hi = jnp.where(split, r_hi, mk_hi)
    mk_new_lo = jnp.where(split, r_lo, mk_lo)
    i_am_j = in_pair & a_is_j
    mhi_out_ref[...] = jnp.where(
        in_pair, jnp.where(i_am_j, mj_new_hi, mk_new_hi), a_hi
    )
    mlo_out_ref[...] = jnp.where(
        in_pair, jnp.where(i_am_j, mj_new_lo, mk_new_lo), a_lo
    )

    for r in range(ext_ref.shape[0]):
        e_own = ext_ref[r]
        e_other = ext_p_ref[r]
        ej = jnp.where(i_am_j, e_own, e_other)
        ek_merged = jnp.where(i_am_j, e_other, e_own) + gf * ej
        e_new = jnp.where(
            i_am_j,
            jnp.where(split, ek_merged, ej),
            ek_merged,
        )
        ext_out_ref[r] = jnp.where(in_pair, e_new, e_own)

    mk_f = _u64_to_f32(mk_hi, mk_lo)
    lead = isf
    rate_ref[...] = jnp.where(lead, gf * mk_f, jnp.float32(0.0))
    deficit_ref[...] = jnp.where(lead, (gamma_f - gf) * mk_f, jnp.float32(0.0))
    coal_ref[...] = jnp.where(lead, gf * mk_f, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_coalesce_mirror(
    mult, ext_rows, kernnorm, rand, is_first, mir_shift, interpret=False
):
    """fused probability->gamma->coalesce under the MIRROR croupier
    (ops/pairing.py): partner(x) = roll(flip(x), mir_shift). Partner rows are
    produced XLA-side (flip + dynamic roll — a few cheap vector passes) and
    the kernel writes every slot's final value directly (the matching is an
    involution; no merge pass). Signature otherwise as ``fused_coalesce``."""
    squeeze = ext_rows.ndim == 1
    if squeeze:
        ext_rows = ext_rows[None, :]
    kernnorm = kernnorm.astype(jnp.float32)
    rand = rand.astype(jnp.float32)
    n_rows = ext_rows.shape[0]
    n = mult.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    pad = n_pad - n

    words = jax.lax.bitcast_convert_type(mult, jnp.uint32)  # (n, 2)
    hi_static = int(np.argmax(np.array([2**32], np.int64).view(np.uint32)))
    m_hi = words[:, hi_static]
    m_lo = words[:, 1 - hi_static]

    def mir(x, axis=0):
        return jnp.roll(jnp.flip(x, axis=axis), mir_shift, axis=axis)

    def prep(x, fill=0):
        x = jnp.pad(x, (0, pad), constant_values=fill) if pad else x
        return x.reshape(n_pad // LANES, LANES)

    def prep_ext(x):
        x = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        return x.reshape(n_rows, n_pad // LANES, LANES)

    isf_i = is_first.astype(jnp.int32)
    args = (
        prep(m_hi), prep(m_lo),
        prep(mir(m_hi)), prep(mir(m_lo)),
        prep_ext(ext_rows), prep_ext(mir(ext_rows, axis=1)),
        prep(kernnorm), prep(mir(kernnorm)),
        prep(rand), prep(mir(rand)),
        prep(isf_i), prep(mir(isf_i)),
    )
    grid = n_pad // _BLOCK
    spec = pl.BlockSpec(
        (BLOCK_R, LANES), lambda i: (i, i * 0), memory_space=pltpu.VMEM
    )
    ext_spec = pl.BlockSpec(
        (n_rows, BLOCK_R, LANES),
        lambda i: (i * 0, i, i * 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [ext_spec if a.ndim == 3 else spec for a in args]
    f32 = jnp.float32
    out = pl.pallas_call(
        _coalesce_kernel_mirror,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[spec, spec, ext_spec, spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct(
                (n_rows, n_pad // LANES, LANES), ext_rows.dtype
            ),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), f32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), f32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), f32),
        ],
        interpret=interpret,
    )(*args)
    mult_flat = [out[i].reshape(n_pad)[:n] for i in (0, 1)]
    ext_new = out[2].reshape(n_rows, n_pad)[:, :n]
    if squeeze:
        ext_new = ext_new[0]
    rates = [out[i].reshape(n_pad)[:n] for i in (3, 4, 5)]
    pair = (
        jnp.stack([mult_flat[0], mult_flat[1]], axis=-1)
        if hi_static == 0
        else jnp.stack([mult_flat[1], mult_flat[0]], axis=-1)
    )
    mult_new = jax.lax.bitcast_convert_type(pair, mult.dtype)
    return (mult_new, ext_new, rates[0], rates[1], rates[2])


def _u01_hash(seed, pair_id):
    """counter-based u01 draw from the pair identity (murmur3-finalizer x2):
    both members of a mirror pair compute the identical value from
    min(o, partner_o), eliminating the need to transport the leader's RNG
    draw across the pair (saves one HBM row + its dual fetch). Quality is
    that of a standard counter-based PRF (avalanche-complete finalizer);
    the croupier RNG stream is implementation-defined (the reference's GPU
    and CPU backends already use different streams)."""
    h = seed ^ (pair_id.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    for _ in range(2):
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
    return (h >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        2.0**-24
    )


def _mk_mirror_block_kernel(n, block_r, n_ext, n_attr, attr_names, kernel_fn):
    """build the in-kernel-partner-fetch mirror coalesce kernel body.

    Partner geometry: with Y = flip(x) (XLA-side static reverse, one cheap
    pass per row), partner(x)[f] = x[(K - f) mod N] = Y[(f + D) mod N] with
    D = (N - 1 - K) mod N. For own block j the partner window is the flat
    slice Y[jB + D, jB + D + B) — it spans two consecutive blocks
    (j + d_blk) and (j + d_blk + 1) fetched via scalar-prefetch-driven
    index maps, realigned in VMEM with two ``pltpu.roll`` rotations (sublane
    + lane with row-carry select). No XLA dynamic roll, no gather, no sort.
    """
    R = block_r
    LB = R * LANES

    def kernel(s_ref, *refs):
        # refs: own[mhi mlo ext attr] flipA[...] flipB[...] scale_ref outs
        n_own = 2 + n_ext + n_attr
        own = refs[:n_own]
        flip_a = refs[n_own : 2 * n_own]
        flip_b = refs[2 * n_own : 3 * n_own]
        scale_ref = refs[3 * n_own]
        (mhi_out_ref, mlo_out_ref, ext_out_ref,
         rate_ref, deficit_ref, coal_ref) = refs[3 * n_own + 1 :]

        # under x64 every traced scalar (incl. the grid index) arrives as
        # i64, which Mosaic cannot legalize — pin i32 explicitly throughout
        i32 = jnp.int32
        r_sh = s_ref[1].astype(i32)
        l_sh = s_ref[2].astype(i32)
        thresh = s_ref[3].astype(i32)
        K = s_ref[4].astype(i32)
        seed = s_ref[5].astype(jnp.uint32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        j = pl.program_id(0).astype(i32)

        def partner(a_blk, b_blk):
            conc = jnp.concatenate([a_blk, b_blk], axis=0)  # (2R, LANES)
            zp = pltpu.roll(conc, r_sh, 0)[: R + 1]
            zs = pltpu.roll(zp, l_sh, 1)
            return jnp.where(lane < thresh, zs[:R], zs[1 : R + 1])

        a_hi, a_lo = own[0][...], own[1][...]
        b_hi = partner(flip_a[0][...], flip_b[0][...])
        b_lo = partner(flip_a[1][...], flip_b[1][...])

        o = (j * i32(R) + row) * i32(LANES) + lane
        po = K - o
        po = jnp.where(po < 0, po + i32(n), po)
        alive = (a_hi | a_lo) != 0
        palive = (b_hi | b_lo) != 0
        in_pair = alive & palive & (po != o)
        isf = in_pair & (po > o)

        # j = not-smaller multiplicity; ties go to the pair LEADER
        a_is_j = (isf & _u64_ge(a_hi, a_lo, b_hi, b_lo)) | (
            (~isf) & (~_u64_ge(b_hi, b_lo, a_hi, a_lo))
        )
        mj_hi = jnp.where(a_is_j, a_hi, b_hi)
        mj_lo = jnp.where(a_is_j, a_lo, b_lo)
        mk_hi = jnp.where(a_is_j, b_hi, a_hi)
        mk_lo = jnp.where(a_is_j, b_lo, a_lo)
        one = jnp.uint32(1)
        mk1_lo = jnp.where((mk_hi == 0) & (mk_lo == 0), one, mk_lo)

        # kernel value from own + partner attribute rows (symmetric in the
        # pair, so one evaluation serves both members)
        attrs_a = {
            name: own[2 + n_ext + i][...]
            for i, name in enumerate(attr_names)
        }
        attrs_b = {
            name: partner(
                flip_a[2 + n_ext + i][...], flip_b[2 + n_ext + i][...]
            )
            for i, name in enumerate(attr_names)
        }
        kn = kernel_fn(attrs_a, attrs_b).astype(jnp.float32) * scale_ref[0, 0]

        # the pair's u01 comes from the pair identity (same at both ends)
        pair_id = jnp.minimum(o, po)
        rand = _u01_hash(seed, pair_id)

        prob = _u64_to_f32(mj_hi, mj_lo) * kn
        gamma_f = jnp.maximum(jnp.ceil(prob - rand), jnp.float32(0.0))
        gamma_f = jnp.where(in_pair, gamma_f, jnp.float32(0.0))

        q_est = jnp.floor(
            _u64_to_f32(mj_hi, mj_lo) / _u64_to_f32(mk_hi, mk1_lo)
        )
        big = jnp.float32(2**31 - 128)
        g_f = jnp.clip(jnp.minimum(q_est, gamma_f), jnp.float32(0.0), big)
        g = g_f.astype(jnp.int32).astype(jnp.uint32)
        cap = (
            jnp.clip(gamma_f, jnp.float32(0.0), big)
            .astype(jnp.int32)
            .astype(jnp.uint32)
        )
        for _ in range(5):
            p_hi, p_lo = _u64_mul_u32(g, mk_hi, mk1_lo)
            too_big = ~_u64_ge(mj_hi, mj_lo, p_hi, p_lo)
            g = jnp.where(too_big, g - 1, g)
        for _ in range(5):
            p_hi, p_lo = _u64_mul_u32(g + 1, mk_hi, mk1_lo)
            fits = _u64_ge(mj_hi, mj_lo, p_hi, p_lo) & (g + 1 <= cap)
            g = jnp.where(fits, g + 1, g)
        g = jnp.where(in_pair, g, jnp.uint32(0))
        gf = _u32_to_f32(g)

        gmk_hi, gmk_lo = _u64_mul_u32(g, mk_hi, mk_lo)
        nn_hi, nn_lo = _u64_sub(mj_hi, mj_lo, gmk_hi, gmk_lo)
        split = in_pair & (nn_hi == 0) & (nn_lo == 0) & (g > 0)
        h_hi, h_lo = _u64_half(mk_hi, mk_lo)
        rr_hi, rr_lo = _u64_sub(mk_hi, mk_lo, h_hi, h_lo)
        mj_new_hi = jnp.where(split, h_hi, nn_hi)
        mj_new_lo = jnp.where(split, h_lo, nn_lo)
        mk_new_hi = jnp.where(split, rr_hi, mk_hi)
        mk_new_lo = jnp.where(split, rr_lo, mk_lo)
        i_am_j = in_pair & a_is_j
        mhi_out_ref[...] = jnp.where(
            in_pair, jnp.where(i_am_j, mj_new_hi, mk_new_hi), a_hi
        )
        mlo_out_ref[...] = jnp.where(
            in_pair, jnp.where(i_am_j, mj_new_lo, mk_new_lo), a_lo
        )

        for r in range(n_ext):
            e_own = own[2 + r][...]
            e_other = partner(flip_a[2 + r][...], flip_b[2 + r][...])
            ej = jnp.where(i_am_j, e_own, e_other)
            ek_merged = jnp.where(i_am_j, e_other, e_own) + gf * ej
            e_new = jnp.where(
                i_am_j,
                jnp.where(split, ek_merged, ej),
                ek_merged,
            )
            ext_out_ref[r] = jnp.where(in_pair, e_new, e_own)

        # per-block (8, LANES) rate partials (Mosaic wants >= (8,128)
        # output tiles; the caller sums the (G*8, LANES) outputs)
        mk_f = _u64_to_f32(mk_hi, mk_lo)
        lead = isf

        def _partial(x):
            return jnp.sum(x.reshape(R // 8, 8, LANES), axis=0)

        rate_ref[...] = _partial(
            jnp.where(lead, gf * mk_f, jnp.float32(0.0))
        )
        deficit_ref[...] = _partial(
            jnp.where(lead, (gamma_f - gf) * mk_f, jnp.float32(0.0))
        )
        coal_ref[...] = _partial(
            jnp.where(lead, gf * mk_f, jnp.float32(0.0))
        )

    return kernel


def fused_coalesce_mirror_blocks(
    mult, ext_rows, attr_rows, attr_names, kernel_fn, scale, K, seed,
    block_r=BLOCK_R, interpret=False,
):
    """mirror-croupier fused coalescence with the partner fetch INSIDE the
    kernel: requires n % (block_r * 128) == 0 (callers fall back to
    ``fused_coalesce_mirror`` otherwise) and an elementwise-safe collision
    kernel (``kernel_fn(attrs_a, attrs_b)`` evaluated in-kernel on f32
    lanes — collision kernel classes advertise this via ``pallas_safe``).

    ``scale`` folds norm_factor (dt/dv*N) and any adaptive/substep
    probability scaling; ``seed`` (u32) keys the in-kernel pair-u01 PRF.
    Returns (mult_new i64, ext_new, rate, deficit, coal) with the rates as
    per-cell scalars (single cell)."""
    squeeze = ext_rows.ndim == 1
    if squeeze:
        ext_rows = ext_rows[None, :]
    if attr_rows.ndim == 1:
        attr_rows = attr_rows[None, :]
    n = mult.shape[0]
    LB = block_r * LANES
    assert n % LB == 0, "caller must check divisibility"
    assert block_r % 8 == 0
    G = n // LB
    n_ext = ext_rows.shape[0]
    n_attr = attr_rows.shape[0]

    words = jax.lax.bitcast_convert_type(mult, jnp.uint32)  # (n, 2)
    hi_static = int(np.argmax(np.array([2**32], np.int64).view(np.uint32)))
    m_hi = words[:, hi_static]
    m_lo = words[:, 1 - hi_static]
    attr_rows = attr_rows.astype(jnp.float32)

    shape2 = lambda x: x.reshape(n // LANES, LANES)
    own_rows = (
        [shape2(m_hi), shape2(m_lo)]
        + [shape2(ext_rows[r]) for r in range(n_ext)]
        + [shape2(attr_rows[r]) for r in range(n_attr)]
    )
    flip_rows = [shape2(jnp.flip(r.reshape(-1))) for r in own_rows]

    # partner-window scalars: D = (N-1-K) mod N decomposed into block,
    # sublane-rotate and lane-rotate amounts (see _mk_mirror_block_kernel)
    K = jnp.asarray(K, jnp.int32)
    D = (n - 1 - K) % n
    d_blk = D // LB
    d_off = D % LB
    r_off = d_off // LANES
    l_off = d_off % LANES
    r_sh = (-r_off) % (2 * block_r)
    l_sh = (-l_off) % LANES
    thresh = LANES - l_off
    scalars = jnp.stack(
        [
            d_blk,
            r_sh,
            l_sh,
            thresh,
            K,
            jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
        ]
    )
    scale_arr = jnp.full((8, LANES), scale, jnp.float32)

    # x64 pitfall: index-map functions trace with i64 grid indices, which
    # Mosaic fails to legalize — cast every index-map value to i32 and
    # avoid jnp remainder (its promotion path recurses); the modular
    # wraparound is a compare-subtract since d_blk < G
    i32 = jnp.int32

    def _wrap(d):
        d = jnp.where(d >= G, d - G, d)
        return jnp.where(d >= G, d - G, d).astype(i32)

    spec_own = pl.BlockSpec(
        (block_r, LANES), lambda i, s: (i32(i), i32(0))
    )
    spec_fa = pl.BlockSpec(
        (block_r, LANES), lambda i, s: (_wrap(i32(i) + s[0]), i32(0))
    )
    spec_fb = pl.BlockSpec(
        (block_r, LANES),
        lambda i, s: (_wrap(i32(i) + s[0] + i32(1)), i32(0)),
    )
    spec_scale = pl.BlockSpec((8, LANES), lambda i, s: (i32(0), i32(0)))
    spec_blk1 = pl.BlockSpec((8, LANES), lambda i, s: (i32(i), i32(0)))
    ext_out_spec = pl.BlockSpec(
        (n_ext, block_r, LANES), lambda i, s: (i32(0), i32(i), i32(0))
    )

    kernel = _mk_mirror_block_kernel(
        n, block_r, n_ext, n_attr, tuple(attr_names), kernel_fn
    )
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=(
                [spec_own] * len(own_rows)
                + [spec_fa] * len(own_rows)
                + [spec_fb] * len(own_rows)
                + [spec_scale]
            ),
            out_specs=[
                spec_own,
                spec_own,
                ext_out_spec,
                spec_blk1,
                spec_blk1,
                spec_blk1,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n_ext, n // LANES, LANES), ext_rows.dtype),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
        ],
        interpret=interpret,
    )(scalars, *own_rows, *flip_rows, *flip_rows, scale_arr)
    mult_flat = [out[i].reshape(n) for i in (0, 1)]
    ext_new = out[2].reshape(n_ext, n)
    if squeeze:
        ext_new = ext_new[0]
    pair = (
        jnp.stack([mult_flat[0], mult_flat[1]], axis=-1)
        if hi_static == 0
        else jnp.stack([mult_flat[1], mult_flat[0]], axis=-1)
    )
    mult_new = jax.lax.bitcast_convert_type(pair, mult.dtype)
    rate, deficit, coal = (out[i].sum() for i in (3, 4, 5))
    return mult_new, ext_new, rate, deficit, coal


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_coalesce(
    mult, ext_rows, kernnorm, rand, is_first, interpret=False
):
    """fused probability->gamma->coalesce for int64 multiplicities and R
    extensive rows (``ext_rows``: (R, n); a 1D (n,) input is treated as one
    row). All per-slot arrays are (n,) in sorted-slot order; ``kernnorm`` is
    kernel_value * norm_factor[cell] * prob_scale (valid at leader slots) —
    with adaptive SDM the per-cell dt_todo/dt factor is folded in by the
    caller. Returns (mult_new i64, ext_new (R, n), rate, deficit, coal) with
    the rate rows per-slot (callers segment-sum them)."""
    squeeze = ext_rows.ndim == 1
    if squeeze:
        ext_rows = ext_rows[None, :]
    # the kernel is an f32 pipeline (TPU production dtype); accept f64
    # inputs from the CPU/interpret test path by casting at the boundary
    kernnorm = kernnorm.astype(jnp.float32)
    rand = rand.astype(jnp.float32)
    n_rows = ext_rows.shape[0]
    n = mult.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    pad = n_pad - n

    words = jax.lax.bitcast_convert_type(mult, jnp.uint32)  # (n, 2)
    # bitcast word order follows host endianness; probe with numpy
    hi_static = int(np.argmax(np.array([2**32], np.int64).view(np.uint32)))
    m_hi = words[:, hi_static]
    m_lo = words[:, 1 - hi_static]

    def prep(x, fill=0):
        x = jnp.pad(x, (0, pad), constant_values=fill) if pad else x
        return x.reshape(n_pad // LANES, LANES)

    def prep_ext(x):
        x = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        return x.reshape(n_rows, n_pad // LANES, LANES)

    isf_i = is_first.astype(jnp.int32)
    rolled = lambda x, s, fill=0: prep(jnp.roll(x, s), fill)
    rolled_ext = lambda x, s: prep_ext(jnp.roll(x, s, axis=1))
    args = (
        prep(m_hi), prep(m_lo),
        rolled(m_hi, -1), rolled(m_lo, -1),
        rolled(m_hi, 1), rolled(m_lo, 1),
        prep_ext(ext_rows), rolled_ext(ext_rows, -1), rolled_ext(ext_rows, 1),
        prep(kernnorm), rolled(kernnorm, 1),
        prep(rand), rolled(rand, 1),
        prep(isf_i), rolled(isf_i, 1),
    )
    grid = n_pad // _BLOCK
    spec = pl.BlockSpec(
        (BLOCK_R, LANES), lambda i: (i, i * 0), memory_space=pltpu.VMEM
    )
    ext_spec = pl.BlockSpec(
        (n_rows, BLOCK_R, LANES),
        lambda i: (i * 0, i, i * 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        ext_spec if a.ndim == 3 else spec for a in args
    ]
    f32 = jnp.float32
    out = pl.pallas_call(
        _coalesce_kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[spec, spec, ext_spec, spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct(
                (n_rows, n_pad // LANES, LANES), ext_rows.dtype
            ),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), f32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), f32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), f32),
        ],
        interpret=interpret,
    )(*args)
    mult_flat = [out[i].reshape(n_pad)[:n] for i in (0, 1)]
    ext_new = out[2].reshape(n_rows, n_pad)[:, :n]
    if squeeze:
        ext_new = ext_new[0]
    rates = [out[i].reshape(n_pad)[:n] for i in (3, 4, 5)]
    pair = (
        jnp.stack([mult_flat[0], mult_flat[1]], axis=-1)
        if hi_static == 0
        else jnp.stack([mult_flat[1], mult_flat[0]], axis=-1)
    )
    mult_new = jax.lax.bitcast_convert_type(pair, mult.dtype)
    return (mult_new, ext_new, rates[0], rates[1], rates[2])
