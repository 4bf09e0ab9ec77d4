"""End-to-end breakup smoke tests on a 0D box (config #2 family:
reference ``tests/unit_tests/dynamics/collisions/test_sdm_breakup.py`` and
the deJong_Mackay_et_al_2023 example setup)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Box
from pysdm_tpu.dynamics import Breakup, Collision
from pysdm_tpu.dynamics.collisions.collision_kernels import ConstantK, Geometric
from pysdm_tpu.dynamics.collisions.breakup_fragmentations import AlwaysN
from pysdm_tpu.dynamics.collisions.coalescence_efficiencies import ConstEc
from pysdm_tpu.dynamics.collisions.breakup_efficiencies import ConstEb
from pysdm_tpu.physics import si


def run_box(dynamic, n_sd, steps, seed=44, dv=1 * si.m**3):
    rng = np.random.default_rng(seed)
    formulae = Formulae(seed=seed)
    builder = Builder(
        n_sd=n_sd, backend=CPU(formulae), environment=Box(dt=1 * si.s, dv=dv)
    )
    builder.add_dynamic(dynamic)
    volume = rng.uniform(0.5, 2.0, n_sd) * (20 * si.um) ** 3
    attributes = {
        "multiplicity": np.full(n_sd, 1e8),
        "volume": volume,
    }
    particulator = builder.build(attributes, products=())
    mass0 = total_mass(particulator)
    particulator.run(steps)
    particulator.block_until_ready()
    return particulator, mass0


def total_mass(particulator):
    mult = particulator.attributes["multiplicity"]
    mass = particulator.attributes["water mass"]
    return float(np.sum(mult.astype(float) * mass))


@pytest.mark.parametrize("handle_all", (False, True))
def test_pure_breakup_grows_multiplicity_conserves_mass(handle_all):
    formulae_kwargs = {}
    dyn = Breakup(
        collision_kernel=ConstantK(a=1e-9 * si.m**3 / si.s),
        fragmentation_function=AlwaysN(n=4),
        adaptive=False,
        substeps=1,
    )
    particulator, mass0 = run_box(dyn, n_sd=2**10, steps=10)
    mass1 = total_mass(particulator)
    np.testing.assert_allclose(mass1, mass0, rtol=1e-6)
    total_mult = float(np.sum(particulator.attributes["multiplicity"]))
    assert total_mult > 1e8 * 2**10  # breakup increased droplet count
    assert float(np.sum(particulator.get_counter("breakup_rate"))) > 0


def test_collision_mixed_coalescence_breakup():
    dyn = Collision(
        collision_kernel=Geometric(),
        coalescence_efficiency=ConstEc(Ec=0.5),
        breakup_efficiency=ConstEb(Eb=1.0),
        fragmentation_function=AlwaysN(n=2),
        adaptive=False,
        substeps=1,
    )
    particulator, mass0 = run_box(dyn, n_sd=2**10, steps=20)
    mass1 = total_mass(particulator)
    np.testing.assert_allclose(mass1, mass0, rtol=1e-6)
    assert float(np.sum(particulator.get_counter("coalescence_rate"))) > 0
    assert float(np.sum(particulator.get_counter("breakup_rate"))) > 0


def test_straub_2010_breakup_config():
    """config #2 analogue (deJong & Mackay et al. 2023): hydrodynamic-style
    collisions with Straub-2010 coalescence efficiency + fragmentation"""
    from pysdm_tpu.dynamics.collisions.coalescence_efficiencies import Straub2010Ec
    from pysdm_tpu.dynamics.collisions.breakup_fragmentations import Straub2010Nf

    dyn = Collision(
        collision_kernel=Geometric(),
        coalescence_efficiency=Straub2010Ec(),
        breakup_efficiency=ConstEb(Eb=1.0),
        fragmentation_function=Straub2010Nf(vmin=(1e-6) ** 3, nfmax=100),
        adaptive=False,
        substeps=1,
    )
    particulator, mass0 = run_box(dyn, n_sd=2**12, steps=30, dv=0.1 * si.m**3)
    mass1 = total_mass(particulator)
    np.testing.assert_allclose(mass1, mass0, rtol=1e-6)
    assert float(np.sum(particulator.get_counter("coalescence_rate"))) > 0
    mult = particulator.attributes["multiplicity"]
    assert np.isfinite(particulator.attributes["water mass"]).all()
    assert (mult >= 0).all()


def test_feingold_and_slams_fragmentation_run():
    from pysdm_tpu.dynamics.collisions.breakup_fragmentations import (
        Feingold1988,
        SLAMS,
    )

    for frag in (
        Feingold1988(scale=(30 * si.um) ** 3 * 4.19),
        SLAMS(),
    ):
        dyn = Breakup(
            collision_kernel=ConstantK(a=1e-9 * si.m**3 / si.s),
            fragmentation_function=frag,
            adaptive=False,
            substeps=1,
        )
        particulator, mass0 = run_box(dyn, n_sd=2**9, steps=5)
        np.testing.assert_allclose(total_mass(particulator), mass0, rtol=1e-6)
        mult = particulator.attributes["multiplicity"]
        assert (mult >= 0).all() and float(np.sum(mult)) > 0
