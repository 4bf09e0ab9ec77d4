"""Breakup op tests: closed-form transfer vs a direct per-event loop oracle
(the semantics of reference ``collisions_methods.py:compute_transfer_multiplicities``)
and conservation checks on the fused collision/coalescence/breakup update."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysdm_tpu.ops.breakup import (
    _transfer_closed_form,
    collision_coalescence_breakup,
    fragmentation_limiters,
)


def loop_oracle(gamma, mult_j, mult_k, mass_j, mass_k, fm, max_mult):
    """event-by-event transfer semantics (per the de Jong et al. 2023
    breakup scheme): each of up to `gamma` collision events turns the pair's
    mass into fragments of mass `fm`, bounded by j's multiplicity and the
    multiplicity overflow cap."""
    take_test = mult_k
    take = 0.0
    nmk_test = (mass_j + mass_k) / fm * mult_k
    nmk = mult_k
    gjk = 0
    overflow = False
    for m in range(int(gamma)):
        if nmk_test > max_mult:
            overflow = True
            break
        if take_test > mult_j:
            break
        take = take_test
        nmk = nmk_test
        gjk = m + 1
        take_test += nmk_test
        nmk_test = nmk_test * (mass_j / fm) + nmk_test
    return take, nmk, gjk, overflow


@pytest.mark.parametrize("seed", range(5))
def test_transfer_closed_form_matches_loop(seed):
    rng = np.random.default_rng(seed)
    n = 256
    gamma = rng.integers(0, 50, n).astype(float)
    mult_k = rng.integers(1, 10**6, n).astype(float)
    mult_j = mult_k * rng.integers(1, 100, n)
    mass_k = 10.0 ** rng.uniform(-15, -9, n)
    mass_j = mass_k * rng.uniform(1, 100, n)
    fm = (mass_j + mass_k) * 10.0 ** rng.uniform(-3, 0, n)
    max_mult = 2**63 / 2e5

    take, nmk, gjk, ovf = _transfer_closed_form(
        jnp.asarray(gamma),
        jnp.asarray(mult_j),
        jnp.asarray(mult_k),
        jnp.asarray(mass_j),
        jnp.asarray(mass_k),
        jnp.asarray(fm),
        jnp.asarray(max_mult),
    )
    for i in range(n):
        t, m, g, o = loop_oracle(
            gamma[i], mult_j[i], mult_k[i], mass_j[i], mass_k[i], fm[i], max_mult
        )
        assert int(gjk[i]) == g, f"i={i}: gamma_j_k {int(gjk[i])} != {g}"
        np.testing.assert_allclose(float(take[i]), t, rtol=1e-9)
        np.testing.assert_allclose(float(nmk[i]), m, rtol=1e-9)
        assert bool(ovf[i]) == o


def test_fragmentation_limiters():
    fm = jnp.asarray([np.nan, 0.0, 5.0, 0.5])
    mass_sum = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    out = np.asarray(fragmentation_limiters(fm, mass_sum))
    np.testing.assert_allclose(out, [1.0, 1.0, 1.0, 0.5])


@pytest.mark.parametrize("handle_all", (False, True))
def test_breakup_conserves_mass_and_grows_multiplicity(handle_all):
    rng = np.random.default_rng(7)
    n_sd = 64
    mult = jnp.asarray(rng.integers(1, 1000, n_sd), dtype=jnp.int64)
    mass = jnp.asarray(10.0 ** rng.uniform(-12, -9, n_sd))
    ext = jnp.stack([mass])
    is_first = jnp.asarray(np.arange(n_sd) % 2 == 0)
    sorted_cell = jnp.zeros(n_sd, dtype=jnp.int32)
    gamma = jnp.asarray(rng.integers(0, 4, n_sd), dtype=jnp.int64)
    counters = {
        "breakup_rate": jnp.zeros(1),
        "breakup_rate_deficit": jnp.zeros(1),
        "coalescence_rate": jnp.zeros(1, dtype=jnp.int64),
    }
    mult_out, ext_out, counters = collision_coalescence_breakup(
        mult_s=mult,
        ext_s=ext,
        ext_names=("signed water mass",),
        gamma=gamma,
        rand=jnp.full(n_sd, 0.5),
        Ec=jnp.zeros(n_sd),  # never coalesce
        Eb=jnp.ones(n_sd),  # always break
        fragment_mass=mass / 3.0,  # fragments ~1/3 of a single droplet
        is_first=is_first,
        sorted_cell=sorted_cell,
        n_cell=1,
        counters=counters,
        max_multiplicity=2**63 // int(2e5),
        handle_all_breakups=handle_all,
        formulae=None,
    )
    total_before = float(jnp.sum(mult * mass))
    total_after = float(jnp.sum(mult_out * ext_out[0]))
    # rounding-to-int of multiplicities rescales attributes to conserve mass
    np.testing.assert_allclose(total_after, total_before, rtol=1e-6)
    assert int(jnp.sum(mult_out)) >= int(jnp.sum(mult))
    assert bool(jnp.all(mult_out >= 1))
    if handle_all:
        # all gamma consumed (no overflow at these sizes) -> zero deficit
        np.testing.assert_allclose(np.asarray(counters["breakup_rate_deficit"]), 0.0)


def test_bounce_and_coalesce_branches():
    n_sd = 8
    mult = jnp.asarray([10, 4, 8, 8, 6, 6, 5, 3], dtype=jnp.int64)
    mass = jnp.full(n_sd, 1e-10)
    ext = jnp.stack([mass])
    is_first = jnp.asarray([True, False] * 4)
    sorted_cell = jnp.zeros(n_sd, dtype=jnp.int32)
    gamma = jnp.ones(n_sd, dtype=jnp.int64)
    counters = {
        "breakup_rate": jnp.zeros(1),
        "breakup_rate_deficit": jnp.zeros(1),
        "coalescence_rate": jnp.zeros(1, dtype=jnp.int64),
    }
    # rand=0.9 > Ec + (1-Ec)*Eb = 0.5 for all -> all bounce
    mult_out, ext_out, _ = collision_coalescence_breakup(
        mult_s=mult,
        ext_s=ext,
        ext_names=("signed water mass",),
        gamma=gamma,
        rand=jnp.full(n_sd, 0.9),
        Ec=jnp.full(n_sd, 0.25),
        Eb=jnp.full(n_sd, 1.0 / 3.0),
        fragment_mass=mass / 2,
        is_first=is_first,
        sorted_cell=sorted_cell,
        n_cell=1,
        counters=counters,
        max_multiplicity=2**63 // int(2e5),
        handle_all_breakups=False,
        formulae=None,
    )
    np.testing.assert_array_equal(np.asarray(mult_out), np.asarray(mult))
    np.testing.assert_allclose(np.asarray(ext_out), np.asarray(ext))

    # rand=0.1 < Ec=0.25 -> all coalesce: j loses gamma*xi_k, k doubles mass
    mult_out, ext_out, counters2 = collision_coalescence_breakup(
        mult_s=mult,
        ext_s=ext,
        ext_names=("signed water mass",),
        gamma=gamma,
        rand=jnp.full(n_sd, 0.1),
        Ec=jnp.full(n_sd, 0.25),
        Eb=jnp.full(n_sd, 1.0 / 3.0),
        fragment_mass=mass / 2,
        is_first=is_first,
        sorted_cell=sorted_cell,
        n_cell=1,
        counters={
            "breakup_rate": jnp.zeros(1),
            "breakup_rate_deficit": jnp.zeros(1),
            "coalescence_rate": jnp.zeros(1, dtype=jnp.int64),
        },
        max_multiplicity=2**63 // int(2e5),
        handle_all_breakups=False,
        formulae=None,
    )
    total_before = float(jnp.sum(mult * mass))
    total_after = float(jnp.sum(mult_out * ext_out[0]))
    np.testing.assert_allclose(total_after, total_before, rtol=1e-12)
    # pair (10,4): j=10 loses 4 -> 6; k=4 doubles attribute mass
    assert int(mult_out[0]) == 6 and int(mult_out[1]) == 4
    np.testing.assert_allclose(float(ext_out[0, 1]), 2e-10)
    # pair (8,8): equal -> j depleted, k splits 4/4
    assert int(mult_out[2]) == 4 and int(mult_out[3]) == 4


class TestLowList1982Nf:
    @staticmethod
    def test_mass_conservation_and_finiteness():
        """LL82 fragment sampling (reference ``lowlist82.py`` +
        ``_ll82_fragmentation_body``): nf * fragment_mass == pair mass,
        all outputs finite, nfmax honored"""
        import jax.numpy as jnp
        from pysdm_tpu.physics import Formulae
        from pysdm_tpu.dynamics.collisions.breakup_fragmentations import (
            LowList1982Nf,
        )

        formulae = Formulae()
        frag = LowList1982Nf(nfmax=1e4)
        n = 256
        rng = np.random.default_rng(5)
        ra = jnp.asarray(rng.uniform(0.3e-3, 1.5e-3, n))
        rb = jnp.asarray(rng.uniform(0.1e-3, 1.0e-3, n))
        va = 4 / 3 * np.pi * ra**3
        vb = 4 / 3 * np.pi * rb**3
        attrs_a = {
            "volume": va, "radius": ra, "water mass": va * 1e3,
            "relative fall velocity": jnp.asarray(rng.uniform(4.0, 9.0, n)),
        }
        attrs_b = {
            "volume": vb, "radius": rb, "water mass": vb * 1e3,
            "relative fall velocity": jnp.asarray(rng.uniform(1.0, 5.0, n)),
        }
        u01 = jnp.asarray(rng.uniform(0, 1, n))
        nf, fmass = frag.pairwise(formulae, attrs_a, attrs_b, u01)
        nf, fmass = np.asarray(nf), np.asarray(fmass)
        assert np.isfinite(nf).all() and np.isfinite(fmass).all()
        assert (nf >= 1 - 1e-9).all() and (nf <= 1e4 + 1e-6).all()
        np.testing.assert_allclose(nf * fmass, np.asarray(va + vb) * 1e3,
                                   rtol=1e-6)

    @staticmethod
    def test_small_drops_coalesce():
        """pairs below the 0.4 mm large-drop threshold produce a single
        coalesced fragment (reference ``_ll82_fragmentation_body`` first
        branch)"""
        import jax.numpy as jnp
        from pysdm_tpu.physics import Formulae
        from pysdm_tpu.dynamics.collisions.breakup_fragmentations import (
            LowList1982Nf,
        )

        formulae = Formulae()
        frag = LowList1982Nf()
        r = jnp.asarray([50e-6, 20e-6])
        v = 4 / 3 * np.pi * r**3
        attrs = lambda rr, vv: {
            "volume": vv, "radius": rr, "water mass": vv * 1e3,
            "relative fall velocity": jnp.asarray([1.0, 0.3]),
        }
        nf, fmass = frag.pairwise(
            formulae, attrs(r, v),
            attrs(jnp.roll(r, -1), jnp.roll(v, -1)),
            jnp.asarray([0.5, 0.5]),
        )
        np.testing.assert_allclose(np.asarray(nf), 1.0, rtol=1e-9)
