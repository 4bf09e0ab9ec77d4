"""Fused mirror-breakup kernel (ops/pallas/breakup.py) vs the XLA mirror
breakup path on the deJong-Mackay-style configuration (geometric kernel,
Berry-1967 Ec, exponential fragmentation) with identical pair-keyed PRF
draws. Multiplicities agree to f32 rounding of the transfer (the
reference's own semantics round to integers); total water mass is
conserved by the attribute rescale on both paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from pysdm_tpu.ops import collisions as coll_ops
from pysdm_tpu.ops.breakup import collision_coalescence_breakup
from pysdm_tpu.ops.pairing import MirrorPairing
from pysdm_tpu.ops.pallas.breakup import fused_breakup_mirror_blocks
from pysdm_tpu.ops.pallas.collision import _u01_hash
from pysdm_tpu.physics import Formulae


@pytest.mark.parametrize("seed_case", (0, 5))
def test_fused_breakup_matches_xla(seed_case):
    from pysdm_tpu.dynamics.collisions.breakup_efficiencies import ConstEb
    from pysdm_tpu.dynamics.collisions.breakup_fragmentations import (
        Exponential,
    )
    from pysdm_tpu.dynamics.collisions.coalescence_efficiencies import (
        Berry1967,
    )
    from pysdm_tpu.dynamics.collisions.collision_kernels import Geometric

    n = 8 * 128 * 4
    rng = np.random.default_rng(seed_case)
    formulae = Formulae(seed=1, fragmentation_function="Exponential")
    mult = rng.integers(1, 2**30, size=n).astype(np.int64)
    mult[rng.uniform(size=n) < 0.03] = 0
    mult = jnp.asarray(mult)
    # wet radii 10..500 um -> masses
    r = np.exp(rng.uniform(np.log(10e-6), np.log(500e-6), n))
    wm = jnp.asarray((4 / 3 * np.pi * r**3 * 1e3).astype(np.float64))
    ext = wm[None, :]
    radius = jnp.asarray(r)
    # Gunn-Kinzer-free fall velocity stand-in (elementwise, monotone)
    relfall = jnp.asarray((r / 50e-6) ** 0.5 * 4.0)
    attrs = {"radius": radius, "relative fall velocity": relfall}

    kernel = Geometric()
    ec = Berry1967()
    eb = ConstEb(1.0)
    frag = Exponential(scale=float(formulae.trivia.volume(radius=100e-6)))
    K = int(rng.integers(0, n))
    seed = jnp.uint32(17 + seed_case)
    scale = 5e8  # norm * dt/dv etc: sized for O(1) probabilities
    max_multiplicity = 2**63 // int(2e5)

    mult_new, ext_new, rate, deficit, coal, brk, brkdef = (
        fused_breakup_mirror_blocks(
            mult, ext, 0, jnp.stack([radius, relfall]),
            ("radius", "relative fall velocity"),
            lambda a, b: kernel.pairwise(formulae, a, b),
            lambda a, b: ec.pairwise(formulae, a, b),
            lambda a, b: eb.pairwise(formulae, a, b),
            lambda a, b, u: frag.pairwise(formulae, a, b, u)[1],
            scale, K, seed, max_multiplicity,
            block_r=8, interpret=True,
        )
    )

    # XLA mirror path with the SAME PRF draws
    pairing = MirrorPairing(K, n, mult > 0)
    is_first = pairing.is_first
    o = jnp.arange(n, dtype=jnp.int32)
    po = (K - o) % n
    pair_id = jnp.minimum(o, po)
    u_gamma = _u01_hash(seed, pair_id)
    u_proc = _u01_hash(seed ^ jnp.uint32(0xA5A5A5A5), pair_id)
    u_frag = _u01_hash(seed ^ jnp.uint32(0x3C3C3C3C), pair_id)
    attrs_b = {k: pairing.partner(v) for k, v in attrs.items()}
    kern = kernel.pairwise(formulae, attrs, attrs_b)
    prob = coll_ops.collision_probability(
        kern.astype(jnp.float32).astype(jnp.float64), mult, None,
        jnp.full((1,), scale), is_first, pairing=pairing,
    )
    gamma, _ = coll_ops.compute_gamma(
        prob.astype(jnp.float32).astype(jnp.float64),
        u_gamma.astype(jnp.float64), mult, None, is_first, 1, None,
        pairing=pairing,
    )
    attrs_wm = {**attrs, "water mass": jnp.abs(wm)}
    attrs_wm_b = {k: pairing.partner(v) for k, v in attrs_wm.items()}
    Ec = ec.pairwise(formulae, attrs_wm, attrs_wm_b)
    Eb = eb.pairwise(formulae, attrs_wm, attrs_wm_b)
    _, fragment_mass = frag.pairwise(
        formulae, attrs_wm, attrs_wm_b, u_frag.astype(jnp.float64)
    )
    mult_ref, ext_ref, _ = collision_coalescence_breakup(
        mult_s=mult,
        ext_s=ext,
        ext_names=["signed water mass"],
        gamma=gamma,
        rand=u_proc.astype(jnp.float64),
        Ec=Ec,
        Eb=Eb,
        fragment_mass=fragment_mass,
        is_first=is_first,
        sorted_cell=None,
        cell_start=None,
        n_cell=1,
        counters=None,
        max_multiplicity=max_multiplicity,
        handle_all_breakups=False,
        formulae=formulae,
        pairing=pairing,
    )

    m_k = np.asarray(mult_new, dtype=np.float64)
    m_x = np.asarray(mult_ref, dtype=np.float64)
    # breakup transfer runs f32 in the kernel, f64 in XLA: multiplicities
    # agree to f32 relative rounding (plus the +-1 integer rounding)
    rel = np.abs(m_k - m_x) / np.maximum(np.maximum(m_k, m_x), 1.0)
    frac_same = float((rel < 1e-4).mean())
    assert frac_same > 0.999, (
        f"{(rel >= 1e-4).sum()} slots disagree; worst rel {rel.max():.2e}"
    )
    # collisions actually happened
    assert not np.array_equal(m_k, np.asarray(mult))
    # mass conservation (both paths; the rescale makes it exact-by-design)
    t0 = float((np.asarray(mult) * np.asarray(wm)).sum())
    tk = float((m_k * np.asarray(ext_new).squeeze()).sum())
    tx = float((m_x * np.asarray(ext_ref).squeeze()).sum())
    np.testing.assert_allclose(tk, t0, rtol=5e-6)
    np.testing.assert_allclose(tx, t0, rtol=1e-9)


@pytest.mark.parametrize("breakup", (False, True))
def test_blocks_dispatch_through_collision_dynamic(breakup, monkeypatch):
    """the Collision dynamic must route single-cell runs with
    block-aligned n_sd into the blocks kernels (coalesce or breakup
    variant) — exercised end-to-end in interpret mode with physics-level
    assertions (mass conserved, collisions happened, counters move)"""
    monkeypatch.setenv("PYSDM_TPU_PALLAS_INTERPRET", "1")
    import numpy as np
    from pysdm_tpu import Builder, Formulae
    from pysdm_tpu.backends import CPU
    from pysdm_tpu.dynamics import Breakup, Coalescence
    from pysdm_tpu.dynamics.collisions.breakup_fragmentations import (
        Exponential,
    )
    from pysdm_tpu.dynamics.collisions.collision_kernels import (
        Geometric,
        Golovin,
    )
    from pysdm_tpu.environments import Box
    from pysdm_tpu.initialisation.sampling.spectral_sampling import (
        ConstantMultiplicity,
    )
    from pysdm_tpu.initialisation.spectra import Exponential as ExpSpectrum

    n_sd = 256 * 128  # exactly one kernel block
    formulae = Formulae(
        seed=3, fragmentation_function="Exponential"
    )
    builder = Builder(
        n_sd=n_sd, backend=CPU(formulae),
        environment=Box(dt=1.0, dv=1e6),
    )
    x_0 = float(formulae.trivia.volume(radius=30.531e-6))
    if breakup:
        builder.add_dynamic(
            Breakup(
                collision_kernel=Geometric(),
                fragmentation_function=Exponential(
                    scale=float(formulae.trivia.volume(radius=100e-6))
                ),
                adaptive=False,
                warn_overflows=False,
            )
        )
    else:
        builder.add_dynamic(
            Coalescence(collision_kernel=Golovin(b=1.5e3), adaptive=False)
        )
    attributes = {}
    attributes["volume"], attributes["multiplicity"] = ConstantMultiplicity(
        ExpSpectrum(norm_factor=(2**23) * 1e6, scale=x_0)
    ).sample(n_sd)
    p = builder.build(attributes)
    m0 = p.attributes["multiplicity"]
    mass0 = float((m0 * p.attributes["water mass"]).sum())
    p.run(3)
    p.block_until_ready()
    m1 = p.attributes["multiplicity"]
    mass1 = float((m1 * p.attributes["water mass"]).sum())
    np.testing.assert_allclose(mass1, mass0, rtol=1e-5)
    assert not np.array_equal(np.asarray(m1), np.asarray(m0))
    assert (np.asarray(m1) >= 0).all()
    assert float(np.asarray(p.get_counter("collision_rate")).sum()) > 0
    if breakup:
        assert float(np.asarray(p.get_counter("breakup_rate")).sum()) > 0
