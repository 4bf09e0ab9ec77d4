"""Seeding + RelaxedVelocity dynamics tests (reference analogues:
``tests/unit_tests/dynamics/test_seeding.py`` and ``test_relaxed_velocity.py``)."""

import numpy as np

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Box
from pysdm_tpu.dynamics import Seeding, RelaxedVelocity
from pysdm_tpu.initialisation import init_fall_momenta
from pysdm_tpu.physics import si


def test_seeding_injects_into_graves():
    n_sd = 32
    formulae = Formulae(seed=6)
    env = Box(dt=1 * si.s, dv=1 * si.m**3)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    seeds = {
        "water mass": np.full(4, 5e-10),
    }
    builder.add_dynamic(Seeding(
        super_droplet_injection_rate=lambda t: 2 * (t < 2.0),
        seeded_particle_extensive_attributes=seeds,
        seeded_particle_multiplicity=np.full(4, 100.0),
    ))
    mult = np.ones(n_sd)
    mult[8:] = np.nan  # reserved slots
    attributes = {
        "multiplicity": mult,
        "water mass": np.full(n_sd, 1e-12),
    }
    particulator = builder.build(attributes)
    # Box has no env clock; add one for the injection-rate callable
    import jax.numpy as jnp
    particulator.sim_state["env"]["t"] = jnp.zeros(())

    assert int((particulator.attributes["multiplicity"] > 0).sum()) == 8
    particulator.run(1)
    alive = np.asarray(particulator.attributes["multiplicity"])
    assert int((alive > 0).sum()) == 10
    assert int(alive.sum()) == 8 + 2 * 100
    wm = np.asarray(particulator.attributes["water mass"])
    assert np.isclose(wm[alive == 100], 5e-10).all()


def test_relaxed_velocity_approaches_terminal():
    n_sd = 16
    formulae = Formulae(seed=6)
    env = Box(dt=0.1 * si.s, dv=1 * si.m**3)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(RelaxedVelocity(c=8.0))
    water_mass = np.full(n_sd, 1e-9)  # ~ 62 um radius
    attributes = {
        "multiplicity": np.ones(n_sd),
        "water mass": water_mass,
        "relative fall momentum": init_fall_momenta(water_mass, formulae, zero=True),
    }
    particulator = builder.build(attributes)
    v0 = np.asarray(particulator.attributes["relative fall velocity"])
    np.testing.assert_allclose(v0, 0.0)
    for steps, _ in ((5, None), (200, None)):
        particulator.run(steps)
    v1 = np.asarray(particulator.attributes["relative fall velocity"])
    from pysdm_tpu.dynamics.terminal_velocity import gunn_kinzer_v_term
    import jax.numpy as jnp
    radius = np.asarray(particulator.attributes["radius"])
    v_term = np.asarray(gunn_kinzer_v_term(formulae.constants, jnp.asarray(radius)))
    np.testing.assert_allclose(v1, v_term, rtol=1e-3)
