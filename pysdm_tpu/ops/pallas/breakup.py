"""Pallas TPU kernel: fused mirror-croupier collision step WITH breakup.

The breakup substep roofline (PERF_NOTES.md round 5) showed the XLA chain
launch/fusion-overhead-bound: ~10^2 small kernels per adaptive substep
(kernel/Ec/Eb/fragmentation evaluations, the gamma walk, the closed-form
transfer, counters) at ~us each for a 0.5 MB state. This kernel fuses the
ENTIRE bounce/coalesce/breakup update — pair probability, gamma capping
(u32-limb 64-bit arithmetic), process choice, fragmentation sampling and
the de Jong/Mackay transfer recursion — into one VMEM-resident pass under
the mirror croupier's in-kernel partner fetch (see
``ops/pallas/collision.py`` for the partner-window geometry).

Precision: the coalescence branch stays u64-exact; the breakup transfer
runs in f32 (the reference computes it in f64 and then ROUNDS the
multiplicities to integers anyway — f32 adds ~1e-7 relative rounding on
the transferred multiplicities, and mass conservation is preserved
EXACTLY by the attribute rescale, reference
``round_multiplicities_to_ints_and_update_attributes`` semantics). The
correction walks around the log-space break-point estimates are widened
to +-4 steps to absorb the f32 log error.

u01 draws (gamma, process choice, fragmentation) come from independent
in-kernel pair-keyed PRF streams (murmur3 finalizer on min(o, partner_o)
with per-purpose seed mixes) — both pair members compute identical draws
with no HBM rows.

Reference semantics: ``collisions_methods.py:248-311`` (process branch),
``:62-243`` (breakup transfer + overflow deficits),
``fragmentation_methods.py`` (limiters).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .collision import (
    BLOCK_R,
    LANES,
    _u01_hash,
    _u32_to_f32,
    _u64_ge,
    _u64_half,
    _u64_mul_u32,
    _u64_sub,
    _u64_to_f32,
)

_F32 = jnp.float32


def _f32_to_u64(x):
    """decompose a non-negative f32 (< 2^63) into (hi, lo) u32 words —
    exact for the f32 value itself (24-bit mantissa)"""
    two32 = _F32(4294967296.0)
    hi_f = jnp.floor(x / two32)
    lo_f = x - hi_f * two32
    hi = hi_f.astype(jnp.int32).astype(jnp.uint32)  # < 2^31 (mult < 2^63)
    lo_half = jnp.floor(lo_f * _F32(0.5))
    lo_bit = lo_f - lo_half * _F32(2.0)
    lo = (lo_half.astype(jnp.int32).astype(jnp.uint32) << 1) | (
        lo_bit.astype(jnp.int32).astype(jnp.uint32)
    )
    return hi, lo


def _transfer_closed_form_f32(gamma_f, mult_j, mult_k, mass_j, mass_k, fm,
                              max_mult):
    """f32 image of ``ops.breakup._transfer_closed_form`` (the de Jong/
    Mackay geometric transfer recursion in closed form): widened +-4
    correction walks absorb the f32 log rounding; overflow to inf in
    ``pair_values`` reads as invalid and walks down (graceful)."""
    tiny = _F32(1e-30)
    fm = jnp.maximum(fm, tiny)
    alpha = (mass_j + mass_k) / fm
    beta = mass_j / fm
    beta_pos = beta > 0.0
    beta_safe = jnp.where(beta_pos, beta, _F32(1.0))
    log1pb = jnp.log1p(beta_safe)
    mk = mult_k
    alpha_safe = jnp.maximum(alpha, tiny)

    def pair_values(g):
        p = jnp.exp((g - 1.0) * log1pb)
        nmk = mk * alpha * p
        tfj = jnp.where(
            beta_pos,
            mk * (1.0 + alpha * (p - 1.0) / beta_safe),
            mk * (1.0 + (g - 1.0) * alpha),
        )
        return nmk, tfj

    def valid(g):
        nmk, tfj = pair_values(g)
        return (g >= 1.0) & (g <= gamma_f) & (nmk <= max_mult) & (
            tfj <= mult_j
        )

    g1 = jnp.floor(jnp.log(max_mult / (mk * alpha_safe)) / log1pb) + 1.0
    rhs2 = 1.0 + beta_safe * (mult_j / mk - 1.0) / alpha_safe
    g2 = jnp.where(
        beta_pos,
        jnp.floor(jnp.log(jnp.maximum(rhs2, 1.0)) / log1pb) + 1.0,
        jnp.floor((mult_j / mk - 1.0) / alpha_safe) + 1.0,
    )
    g = jnp.clip(jnp.minimum(jnp.minimum(g1, g2), gamma_f), 0.0, gamma_f)
    g = jnp.where(jnp.isnan(g), _F32(0.0), g)
    for _ in range(4):  # widened walks: f32 log estimates
        g = jnp.where(valid(g + 1.0), g + 1.0, g)
    for _ in range(4):
        g = jnp.where(valid(g) | (g <= 0.0), g, g - 1.0)
    g = jnp.maximum(g, 0.0)

    nmk_g, tfj_g = pair_values(jnp.maximum(g, 1.0))
    take_from_j = jnp.where(g >= 1.0, tfj_g, _F32(0.0))
    new_mult_k = jnp.where(g >= 1.0, nmk_g, mk)
    return take_from_j, new_mult_k, g


def _fragmentation_limiters_f32(fragment_mass, mass_sum):
    """reference ``fragmentation_limiters`` (NaN/zero -> whole mass;
    fragment <= total); vmin/nfmax handled by the frag closure"""
    fm = jnp.where(
        jnp.isnan(fragment_mass) | (fragment_mass <= 0.0),
        mass_sum, fragment_mass,
    )
    fm = jnp.minimum(fm, mass_sum)
    return jnp.where(mass_sum <= 0.0, jnp.ones_like(fm), fm)


def _mk_breakup_kernel(n, block_r, n_ext, wm_index, n_attr, attr_names,
                       kernel_fn, ec_fn, eb_fn, frag_fn, max_multiplicity):
    R = block_r

    def kernel(s_ref, *refs):
        n_own = 2 + n_ext + n_attr
        own = refs[:n_own]
        flip_a = refs[n_own : 2 * n_own]
        flip_b = refs[2 * n_own : 3 * n_own]
        scale_ref = refs[3 * n_own]
        (mhi_out_ref, mlo_out_ref, ext_out_ref,
         rate_ref, deficit_ref, coal_ref, brk_ref, brkdef_ref) = (
            refs[3 * n_own + 1 :]
        )

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
            conc = jnp.concatenate([a_blk, b_blk], axis=0)
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

        a_is_j = (isf & _u64_ge(a_hi, a_lo, b_hi, b_lo)) | (
            (~isf) & (~_u64_ge(b_hi, b_lo, a_hi, a_lo))
        )
        mj_hi = jnp.where(a_is_j, a_hi, b_hi)
        mj_lo = jnp.where(a_is_j, a_lo, b_lo)
        mk_hi = jnp.where(a_is_j, b_hi, a_hi)
        mk_lo = jnp.where(a_is_j, b_lo, a_lo)
        one = jnp.uint32(1)
        mk1_lo = jnp.where((mk_hi == 0) & (mk_lo == 0), one, mk_lo)

        attrs_a = {
            name: own[2 + n_ext + i][...].astype(_F32)
            for i, name in enumerate(attr_names)
        }
        attrs_b = {
            name: partner(
                flip_a[2 + n_ext + i][...], flip_b[2 + n_ext + i][...]
            ).astype(_F32)
            for i, name in enumerate(attr_names)
        }
        kn = kernel_fn(attrs_a, attrs_b).astype(_F32) * scale_ref[0, 0]
        # efficiencies may be python-float constants (ConstEc/ConstEb)
        Ec = jnp.asarray(ec_fn(attrs_a, attrs_b), _F32)
        Eb = jnp.asarray(eb_fn(attrs_a, attrs_b), _F32)

        pair_id = jnp.minimum(o, po)
        u_gamma = _u01_hash(seed, pair_id)
        u_proc = _u01_hash(seed ^ jnp.uint32(0xA5A5A5A5), pair_id)
        u_frag = _u01_hash(seed ^ jnp.uint32(0x3C3C3C3C), pair_id)

        # gamma = min(ceil(prob - u), floor(mj/mk)) — u64-exact walk
        prob = _u64_to_f32(mj_hi, mj_lo) * kn
        gamma_f = jnp.maximum(jnp.ceil(prob - u_gamma), _F32(0.0))
        gamma_f = jnp.where(in_pair, gamma_f, _F32(0.0))
        q_est = jnp.floor(
            _u64_to_f32(mj_hi, mj_lo) / _u64_to_f32(mk_hi, mk1_lo)
        )
        big = _F32(2**31 - 128)
        g_f = jnp.clip(jnp.minimum(q_est, gamma_f), _F32(0.0), big)
        g = g_f.astype(jnp.int32).astype(jnp.uint32)
        cap = (
            jnp.clip(gamma_f, _F32(0.0), big)
            .astype(jnp.int32).astype(jnp.uint32)
        )
        for _ in range(5):
            p_hi, p_lo = _u64_mul_u32(g, mk_hi, mk1_lo)
            g = jnp.where(~_u64_ge(mj_hi, mj_lo, p_hi, p_lo), g - 1, g)
        for _ in range(5):
            p_hi, p_lo = _u64_mul_u32(g + 1, mk_hi, mk1_lo)
            fits = _u64_ge(mj_hi, mj_lo, p_hi, p_lo) & (g + 1 <= cap)
            g = jnp.where(fits, g + 1, g)
        g = jnp.where(in_pair, g, jnp.uint32(0))
        gf = _u32_to_f32(g)
        mk_f = _u64_to_f32(mk_hi, mk_lo)

        # process choice (reference _collision_coalescence_body): bounce if
        # u > Ec + (1-Ec)Eb; coalesce if u < Ec; else break up
        active = in_pair & (g > 0)
        bouncing = u_proc - (Ec + (1.0 - Ec) * Eb) > 0.0
        do_coal = active & ~bouncing & (u_proc - Ec < 0.0)
        do_break = active & ~bouncing & ~do_coal
        i_am_j = in_pair & a_is_j

        # ---- coalescence branch (u64-exact, as in the coalesce kernel) ---
        gmk_hi, gmk_lo = _u64_mul_u32(g, mk_hi, mk_lo)
        nn_hi, nn_lo = _u64_sub(mj_hi, mj_lo, gmk_hi, gmk_lo)
        split = do_coal & (nn_hi == 0) & (nn_lo == 0)
        h_hi, h_lo = _u64_half(mk_hi, mk_lo)
        r_hi, r_lo = _u64_sub(mk_hi, mk_lo, h_hi, h_lo)
        cj_hi = jnp.where(split, h_hi, nn_hi)
        cj_lo = jnp.where(split, h_lo, nn_lo)
        ck_hi = jnp.where(split, r_hi, mk_hi)
        ck_lo = jnp.where(split, r_lo, mk_lo)
        coal_hi = jnp.where(i_am_j, cj_hi, ck_hi)
        coal_lo = jnp.where(i_am_j, cj_lo, ck_lo)

        # ---- breakup branch (f32) ---------------------------------------
        e_own = [own[2 + r][...].astype(_F32) for r in range(n_ext)]
        e_oth = [
            partner(flip_a[2 + r][...], flip_b[2 + r][...]).astype(_F32)
            for r in range(n_ext)
        ]
        ej = [jnp.where(i_am_j, a, b) for a, b in zip(e_own, e_oth)]
        ek = [jnp.where(i_am_j, b, a) for a, b in zip(e_own, e_oth)]
        mass_j = jnp.abs(ej[wm_index])
        mass_k = jnp.abs(ek[wm_index])
        mass_sum = mass_j + mass_k
        # fragmentation closure sees the same attr dicts as the XLA path
        # (slot order, water mass included from the extensive rows)
        attrs_a_f = dict(attrs_a)
        attrs_b_f = dict(attrs_b)
        attrs_a_f["water mass"] = jnp.abs(e_own[wm_index])
        attrs_b_f["water mass"] = jnp.abs(e_oth[wm_index])
        frag_mass = frag_fn(attrs_a_f, attrs_b_f, u_frag).astype(_F32)
        fm = _fragmentation_limiters_f32(frag_mass, mass_sum)
        mj_f = _u64_to_f32(mj_hi, mj_lo)
        gamma_brk = jnp.where(do_break, gf, _F32(0.0))
        take, nmk, gjk = _transfer_closed_form_f32(
            gamma_brk, mj_f, jnp.maximum(mk_f, _F32(1.0)), mass_j, mass_k,
            fm, _F32(float(max_multiplicity)),
        )
        # apply (reference get_new_multiplicities_and_update_attributes):
        ek_mix = [
            (e_k * mk_f + take * e_j) / jnp.maximum(nmk, _F32(1e-30))
            for e_j, e_k in zip(ej, ek)
        ]
        deplete = take >= mj_f
        nj = jnp.where(deplete, nmk * 0.5, mj_f - take)
        nk = jnp.where(deplete, nmk * 0.5, nmk)
        ej_mix = [
            jnp.where(deplete, em, e_j) for em, e_j in zip(ek_mix, ej)
        ]
        bj_new = jnp.maximum(jnp.round(nj), _F32(1.0))
        bk_new = jnp.maximum(jnp.round(nk), _F32(1.0))
        ej_out = [em * (nj / bj_new) for em in ej_mix]
        ek_out = [em * (nk / bk_new) for em in ek_mix]
        brk_f = jnp.where(i_am_j, bj_new, bk_new)
        brk_hi, brk_lo = _f32_to_u64(brk_f)

        # ---- per-slot output select -------------------------------------
        out_hi = jnp.where(
            do_break, brk_hi, jnp.where(do_coal, coal_hi, a_hi)
        )
        out_lo = jnp.where(
            do_break, brk_lo, jnp.where(do_coal, coal_lo, a_lo)
        )
        mhi_out_ref[...] = out_hi
        mlo_out_ref[...] = out_lo

        gf32 = gf
        for r in range(n_ext):
            # coalescence: ek_merged = ek + gamma*ej; split -> both merged
            ekm = ek[r] + gf32 * ej[r]
            coal_e = jnp.where(
                i_am_j, jnp.where(split, ekm, ej[r]), ekm
            )
            brk_e = jnp.where(i_am_j, ej_out[r], ek_out[r])
            ext_out_ref[r] = jnp.where(
                do_break, brk_e,
                jnp.where(do_coal, coal_e, own[2 + r][...].astype(_F32)),
            ).astype(ext_out_ref.dtype)

        def _partial(x):
            return jnp.sum(x.reshape(R // 8, 8, LANES), axis=0)

        lead = isf
        rate_ref[...] = _partial(jnp.where(lead, gf * mk_f, _F32(0.0)))
        deficit_ref[...] = _partial(
            jnp.where(lead, (gamma_f - gf) * mk_f, _F32(0.0))
        )
        coal_ref[...] = _partial(
            jnp.where(lead & do_coal, gf * mk_f, _F32(0.0))
        )
        brk_ref[...] = _partial(
            jnp.where(lead & do_break, gjk * mk_f, _F32(0.0))
        )
        brkdef_ref[...] = _partial(
            jnp.where(lead & do_break, (gf - gjk) * mk_f, _F32(0.0))
        )

    return kernel


def fused_breakup_mirror_blocks(
    mult, ext_rows, wm_index, attr_rows, attr_names,
    kernel_fn, ec_fn, eb_fn, frag_fn,
    scale, K, seed, max_multiplicity,
    block_r=BLOCK_R, interpret=False,
):
    """fused mirror-croupier bounce/coalesce/breakup step with the partner
    fetch in-kernel: requires n % (block_r * 128) == 0 and elementwise-safe
    kernel/efficiency/fragmentation closures (``kernel_fn(a, b)``,
    ``ec_fn(a, b)``, ``eb_fn(a, b)``, ``frag_fn(a, b, u01, mass_sum) ->
    fragment_mass``, all on f32 attr-row dicts). Returns
    (mult_new i64, ext_new, rate, deficit, coal, brk, brk_deficit) with the
    rates as per-cell scalars (single cell)."""
    squeeze = ext_rows.ndim == 1
    if squeeze:
        ext_rows = ext_rows[None, :]
    if attr_rows.ndim == 1:
        attr_rows = attr_rows[None, :]
    n = mult.shape[0]
    LB = block_r * LANES
    assert n % LB == 0 and block_r % 8 == 0
    G = n // LB
    n_ext = ext_rows.shape[0]
    n_attr = attr_rows.shape[0]

    words = jax.lax.bitcast_convert_type(mult, jnp.uint32)
    hi_static = int(np.argmax(np.array([2**32], np.int64).view(np.uint32)))
    m_hi = words[:, hi_static]
    m_lo = words[:, 1 - hi_static]
    attr_rows = attr_rows.astype(jnp.float32)
    ext_f = ext_rows.astype(jnp.float32)

    shape2 = lambda x: x.reshape(n // LANES, LANES)
    own_rows = (
        [shape2(m_hi), shape2(m_lo)]
        + [shape2(ext_f[r]) for r in range(n_ext)]
        + [shape2(attr_rows[r]) for r in range(n_attr)]
    )
    flip_rows = [shape2(jnp.flip(r.reshape(-1))) for r in own_rows]

    K = jnp.asarray(K, jnp.int32)
    D = (n - 1 - K) % n
    d_blk = D // LB
    d_off = D % LB
    r_off = d_off // LANES
    l_off = d_off % LANES
    r_sh = (-r_off) % (2 * block_r)
    l_sh = (-l_off) % LANES
    thresh = LANES - l_off
    scalars = jnp.stack([
        d_blk, r_sh, l_sh, thresh, K,
        jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
    ])
    scale_arr = jnp.full((8, LANES), scale, jnp.float32)

    i32 = jnp.int32

    def _wrap(d):
        d = jnp.where(d >= G, d - G, d)
        return jnp.where(d >= G, d - G, d).astype(i32)

    spec_own = pl.BlockSpec((block_r, LANES), lambda i, s: (i32(i), i32(0)))
    spec_fa = pl.BlockSpec(
        (block_r, LANES), lambda i, s: (_wrap(i32(i) + s[0]), i32(0))
    )
    spec_fb = pl.BlockSpec(
        (block_r, LANES),
        lambda i, s: (_wrap(i32(i) + s[0] + i32(1)), i32(0)),
    )
    spec_scale = pl.BlockSpec((8, LANES), lambda i, s: (i32(0), i32(0)))
    spec_blk = pl.BlockSpec((8, LANES), lambda i, s: (i32(i), i32(0)))
    ext_out_spec = pl.BlockSpec(
        (n_ext, block_r, LANES), lambda i, s: (i32(0), i32(i), i32(0))
    )

    kernel = _mk_breakup_kernel(
        n, block_r, n_ext, wm_index, n_attr, tuple(attr_names),
        kernel_fn, ec_fn, eb_fn, frag_fn, max_multiplicity,
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
                spec_own, spec_own, ext_out_spec,
                spec_blk, spec_blk, spec_blk, spec_blk, spec_blk,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n_ext, n // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
            jax.ShapeDtypeStruct((G * 8, LANES), f32),
        ],
        interpret=interpret,
    )(scalars, *own_rows, *flip_rows, *flip_rows, scale_arr)
    mult_flat = [out[i].reshape(n) for i in (0, 1)]
    ext_new = out[2].reshape(n_ext, n).astype(ext_rows.dtype)
    if squeeze:
        ext_new = ext_new[0]
    pair = (
        jnp.stack([mult_flat[0], mult_flat[1]], axis=-1)
        if hi_static == 0
        else jnp.stack([mult_flat[1], mult_flat[0]], axis=-1)
    )
    mult_new = jax.lax.bitcast_convert_type(pair, mult.dtype)
    sums = [out[i].sum() for i in (3, 4, 5, 6, 7)]
    return (mult_new, ext_new, *sums)
