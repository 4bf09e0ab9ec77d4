"""Golden-trace parity tests: committed expected state trajectories for
multi-cell coalescence, breakup and time-dependent freezing under injected
u01 streams, hand-derived step by step from the reference algorithms
(``collisions_methods.py:45-59,136-243,522-560``,
``freezing_methods.py:79-111``). Unlike the single-cell hand cases in
``test_u01_injection.py``, these protect the multi-cell segment logic:
per-cell normalization, in-cell pairing after the bucket shuffle, and
per-cell counter accumulation."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.dynamics import Breakup, Coalescence, Freezing
from pysdm_tpu.dynamics.collisions.breakup_fragmentations import AlwaysN
from pysdm_tpu.dynamics.collisions.collision_kernels import ConstantK
from pysdm_tpu.environments import Box
from pysdm_tpu.impl.mesh import Mesh
from pysdm_tpu.physics import si

RHO_W = 1000.0


class TestMultiCellCoalescenceGolden:
    """3 cells x 4 super-droplets, ConstantK(a=1), dv=1 per cell, dt=1.

    Derivation (reference ``compute_gamma`` + ``coalesce``): per cell the
    Shima eq. 20 norm = dt/dv * 4*3/2 / 2 = 3; ascending shuffle keys keep
    in-cell order, so pairs are (slot0,slot1), (slot2,slot3); rand=0.999999
    makes gamma_f = prob (integer); gamma = min(gamma_f, floor(xi_j/xi_k)).

    cell 0 [16,8,4,2]: (16,8): gamma=min(48,2)=2 -> xi_j=0 -> split -> (4,4),
      both volumes 1e-12+2*1e-12=3e-12; (4,2): gamma=min(12,2)=2 -> split ->
      (1,1), volumes 3e-12.
    cell 1 [10,10,3,1]: (10,10): tie -> j=leader, gamma=min(30,1)=1 ->
      split -> (5,5), volumes 2e-12; (3,1): gamma=min(9,3)=3 -> xi_j=0 ->
      split of mk=1: half_floor(1)=0 -> (0,1), volumes 4e-12.
    cell 2 [7,5,2,2]: (7,5): gamma=min(21,1)=1 -> xi_j=2 (no split): j keeps
      1e-12, k=5 @ 2e-12; (2,2): gamma=min(6,1)=1 -> split -> (1,1) @ 2e-12.
    """

    N_CELL = 3
    MULT0 = np.asarray([16, 8, 4, 2, 10, 10, 3, 1, 7, 5, 2, 2])
    EXPECTED_MULT = np.asarray([4, 4, 1, 1, 5, 5, 0, 1, 2, 5, 1, 1])
    EXPECTED_VOL = (
        np.asarray([3, 3, 3, 3, 2, 2, 4, 4, 1, 2, 2, 2]) * 1e-12
    )

    def build(self):
        n_sd = 12
        formulae = Formulae(seed=7)
        builder = Builder(
            n_sd=n_sd, backend=CPU(formulae),
            environment=Box(dt=1 * si.s, dv=1 * si.m**3),
        )
        builder.particulator.mesh = Mesh(
            (self.N_CELL,), (float(self.N_CELL),)
        )
        builder.enable_u01_injection()
        builder.add_dynamic(
            Coalescence(collision_kernel=ConstantK(a=1.0), adaptive=False)
        )
        attributes = {
            "multiplicity": self.MULT0.astype(np.int64),
            "volume": np.full(n_sd, 1e-12),
            "cell id": np.repeat(np.arange(self.N_CELL, dtype=np.int64), 4),
        }
        return builder.build(attributes)

    def test_one_step_matches_committed_trace(self):
        p = self.build()
        n_sd = 12
        p.inject_u01(
            {
                "collision_shuffle": np.linspace(0.05, 0.95, n_sd),
                "collision_gamma": np.full(n_sd, 0.999999),
                "collision_process": np.zeros(n_sd),
                "collision_fragmentation": np.zeros(n_sd),
            }
        )
        p.run(1)
        p.block_until_ready()
        particles = p.sim_state["particles"]
        cell = np.asarray(particles.cell_id)
        mult = np.asarray(p.attributes["multiplicity"])
        vol = np.asarray(p.attributes["volume"])
        # state is cell-major in sorted order; in-cell order preserved by
        # the ascending injected keys
        np.testing.assert_array_equal(
            cell, np.repeat(np.arange(self.N_CELL), 4)
        )
        np.testing.assert_array_equal(mult, self.EXPECTED_MULT)
        np.testing.assert_allclose(vol, self.EXPECTED_VOL, rtol=1e-6)
        # per-cell rate counters (reference atomic counters ->
        # deterministic segment sums): sum of gamma * xi_k per cell
        rate = np.asarray(p.get_counter("coalescence_rate"))
        #   cell0: 2*8 + 2*2 = 20; cell1: 1*10 + 3*1 = 13; cell2: 1*5+1*2 = 7
        np.testing.assert_array_equal(rate, [20, 13, 7])

    def test_mass_and_rates_after_two_steps(self):
        """second step from the committed post-step-1 state, same streams —
        total water per cell is invariant across the whole trajectory"""
        p = self.build()
        n_sd = 12
        streams = {
            "collision_shuffle": np.linspace(0.05, 0.95, n_sd),
            "collision_gamma": np.full(n_sd, 0.999999),
            "collision_process": np.zeros(n_sd),
            "collision_fragmentation": np.zeros(n_sd),
        }
        for _ in range(2):
            p.inject_u01(streams)
            p.run(1)
        p.block_until_ready()
        particles = p.sim_state["particles"]
        cell = np.asarray(particles.cell_id)
        mult = np.asarray(p.attributes["multiplicity"], dtype=float)
        mass = np.asarray(p.attributes["water mass"])
        cell_mass = np.asarray(
            [np.sum((mult * mass)[cell == c]) for c in range(self.N_CELL)]
        )
        mass0 = 1e-12 * RHO_W
        expected = np.asarray([30.0, 24.0, 16.0]) * mass0
        np.testing.assert_allclose(cell_mass, expected, rtol=1e-6)


class TestBreakupGolden:
    """one pair [4 @ 2e-12 m^3, 2 @ 1e-12 m^3], ConstantK(1), AlwaysN(n=2).

    Derivation (reference ``break_up``/``compute_transfer_multiplicities``):
    norm = 1 (n=2); prob = 4; rand=0.5 -> gamma_f = 4 capped at
    floor(4/2) = 2. Ec=0, Eb=1 -> always breakup. fragment mass =
    (2+1)e-9/2 = 1.5e-9; alpha = 2, beta = 4/3:
      g=1: new_mult_k = 2*2 = 4, take_from_j = 2 (valid);
      g=2: take_from_j = 6 > xi_j = 4 (invalid) -> gamma_j_k = 1.
    Update: xi_j = 4-2 = 2 keeps mass 2e-9; xi_k = 4 fragments of
    (1e-9*2 + 2*2e-9)/4 = 1.5e-9. Rate = 1*2 = 2; deficit = (2-1)*2 = 2.
    """

    def test_single_breakup_event(self):
        formulae = Formulae(seed=7)
        builder = Builder(
            n_sd=2, backend=CPU(formulae),
            environment=Box(dt=1 * si.s, dv=1 * si.m**3),
        )
        builder.enable_u01_injection()
        builder.add_dynamic(
            Breakup(
                collision_kernel=ConstantK(a=1.0),
                fragmentation_function=AlwaysN(n=2),
                adaptive=False,
            )
        )
        p = builder.build(
            {
                "multiplicity": np.asarray([4, 2], dtype=np.int64),
                "volume": np.asarray([2e-12, 1e-12]),
            }
        )
        p.inject_u01(
            {
                "collision_shuffle": np.asarray([0.1, 0.9]),
                "collision_gamma": np.asarray([0.5, 0.5]),
                "collision_process": np.asarray([0.5, 0.5]),
                "collision_fragmentation": np.asarray([0.5, 0.5]),
            }
        )
        p.run(1)
        p.block_until_ready()
        mult = np.asarray(p.attributes["multiplicity"])
        mass = np.asarray(p.attributes["water mass"])
        np.testing.assert_array_equal(mult, [2, 4])
        np.testing.assert_allclose(mass, [2e-9, 1.5e-9], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p.get_counter("breakup_rate")), [2.0]
        )
        np.testing.assert_allclose(
            np.asarray(p.get_counter("breakup_rate_deficit")), [2.0]
        )
        # mass conserved: 4*2 + 2*1 = 2*2 + 4*1.5 (in 1e-9 kg)
        np.testing.assert_allclose(
            float((mult * mass).sum()), 10e-9, rtol=1e-9
        )


class TestTimeDependentFreezingGolden:
    """3 cells, constant J_het = 1e5 1/m^2/s, insoluble areas 1e-5 m^2,
    dt=1 -> freezing probability per step p = 1 - exp(-1) = 0.63212...
    (reference ``freezing_methods.py:79-111`` Poisson sampling).

    Committed expectations: a particle freezes iff its injected u01 < p
    AND its cell is water-supersaturated AND it has insoluble area.
    """

    def test_frozen_mask_matches_committed_trace(self):
        n_sd = 6
        formulae = Formulae(
            seed=7,
            particle_shape_and_density="MixedPhaseSpheres",
            heterogeneous_ice_nucleation_rate="Constant",
            constants={"J_HET": 1e5},
        )
        env = Box(dt=1 * si.s, dv=1 * si.m**3)
        builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
        builder.particulator.mesh = Mesh((3,), (3.0,))
        builder.enable_u01_injection()
        builder.add_dynamic(
            Freezing(singular=False, immersion_freezing=True)
        )
        env["T"] = np.full(3, 250.0)
        env["RH"] = np.asarray([1.05, 0.90, 1.05])  # cell 1 subsaturated
        areas = np.asarray([1e-5, 1e-5, 1e-5, 1e-5, 0.0, 1e-5])
        p = builder.build(
            {
                "multiplicity": np.ones(n_sd, dtype=np.int64),
                "water mass": np.full(n_sd, 1e-12),
                "immersed surface area": areas,
                "cell id": np.repeat(np.arange(3, dtype=np.int64), 2),
            }
        )
        p_freeze = 1.0 - np.exp(-1.0)  # J * A * dt = 1
        rand = np.asarray([0.50, 0.70, 0.10, 0.10, 0.10, 0.64])
        p.inject_u01({"freezing_immersion": rand})
        p.run(1)
        p.block_until_ready()
        frozen = np.asarray(p.attributes["signed water mass"]) < 0
        expected = np.asarray([
            True,    # cell 0, rand 0.50 < 0.632
            False,   # cell 0, rand 0.70 > 0.632
            False,   # cell 1 subsaturated
            False,   # cell 1 subsaturated
            False,   # cell 2 but no insoluble area
            False,   # cell 2, rand 0.64 > 0.632 (knife-edge above p)
        ])
        assert 0.63 < p_freeze < 0.633
        np.testing.assert_array_equal(frozen, expected)
        # mass magnitude unchanged by the phase flip
        np.testing.assert_allclose(
            np.abs(np.asarray(p.attributes["signed water mass"])), 1e-12
        )
