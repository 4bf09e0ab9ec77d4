"""Freezing tests (reference analogue:
``tests/unit_tests/dynamics/test_freezing_*`` and the Alpert & Knopf 2016
statistical regression style): singular spectrum consistency and Poisson
statistics of the time-dependent formulations."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Box
from pysdm_tpu.dynamics import Freezing
from pysdm_tpu.initialisation.sampling.spectro_glacial_sampling import (
    SpectroGlacialSampling,
)
from pysdm_tpu.initialisation import spectra
from pysdm_tpu.physics import si


def make_box(formulae, n_sd, attributes, dt=1.0, T=250.0, RH=1.05):
    env = Box(dt=dt, dv=1 * si.m**3)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    env["T"] = np.asarray([T])
    env["RH"] = np.asarray([RH])
    builder.add_dynamic(Freezing(**attributes.pop("__freezing_kwargs__")))
    return builder, env, builder.build(attributes)


def test_singular_freezing_follows_spectrum():
    n_sd = 4096
    formulae = Formulae(
        seed=303,
        particle_shape_and_density="MixedPhaseSpheres",
        freezing_temperature_spectrum="Niemand_et_al_2012",
        constants={"NIEMAND_A": -0.517, "NIEMAND_B": 8.934},
    )
    sampling = SpectroGlacialSampling(
        freezing_temperature_spectrum=formulae.freezing_temperature_spectrum,
        insoluble_surface_spectrum=spectra.Lognormal(
            norm_factor=1.0, m_mode=1e-9, s_geom=2.0  # ~um^2-scale areas in m^2
        ),
        seed=303,
    )
    T_fz, A_insol, _ = sampling.sample(n_sd=n_sd)
    assert (T_fz < 273.15).all() and (T_fz > 200).all()

    attributes = {
        "multiplicity": np.ones(n_sd),
        "water mass": np.full(n_sd, 1e-12),
        "freezing temperature": T_fz,
        "__freezing_kwargs__": dict(singular=True),
    }
    builder, env, particulator = make_box(formulae, n_sd, attributes, T=250.0)
    particulator.run(1)
    frozen = np.asarray(particulator.attributes["signed water mass"]) < 0
    # all particles with T_fz >= 250 K freeze, none below
    np.testing.assert_array_equal(frozen, T_fz >= 250.0)

    # subsaturated -> no freezing
    attributes2 = {
        "multiplicity": np.ones(n_sd),
        "water mass": np.full(n_sd, 1e-12),
        "freezing temperature": T_fz,
        "__freezing_kwargs__": dict(singular=True),
    }
    _, _, p2 = make_box(formulae, n_sd, attributes2, T=250.0, RH=0.9)
    p2.run(1)
    assert (np.asarray(p2.attributes["signed water mass"]) > 0).all()


@pytest.mark.parametrize("mode", ("het", "hom"))
def test_time_dependent_freezing_poisson_statistics(mode):
    """constant-rate J: frozen fraction after time t must match
    1 - exp(-J * X * t) (the Poisson avoidance function)"""
    n_sd = 8192
    dt, n_steps = 0.5, 20
    if mode == "het":
        area = 1e-10
        j = 1e8  # 1/m^2/s -> rate J*A = 1e-2 per second
        formulae = Formulae(
            seed=404,
            particle_shape_and_density="MixedPhaseSpheres",
            heterogeneous_ice_nucleation_rate="Constant",
            constants={"J_HET": j},
        )
        rate = j * area
        kwargs = dict(singular=False)
        extra = {"immersed surface area": np.full(n_sd, area)}
    else:
        volume = 1e-15  # ~6 um radius droplet volume, m^3
        j = 1e13  # 1/m^3/s -> rate J*V = 1e-2 per second
        formulae = Formulae(
            seed=404,
            particle_shape_and_density="MixedPhaseSpheres",
            homogeneous_ice_nucleation_rate="Constant",
            constants={"J_HOM": j},
        )
        rate = j * volume
        kwargs = dict(
            singular=False, immersion_freezing=False, homogeneous_freezing=True
        )
        extra = {}

    water_mass = (
        np.full(n_sd, 1e-15 * 1e3)  # volume 1e-15 m^3 at rho_w=1e3
    )
    attributes = {
        "multiplicity": np.ones(n_sd),
        "water mass": water_mass,
        **extra,
        "__freezing_kwargs__": kwargs,
    }
    builder, env, particulator = make_box(
        formulae, n_sd, attributes, dt=dt, T=230.0, RH=1.5
    )
    particulator.run(n_steps)
    frozen_fraction = float(
        (np.asarray(particulator.attributes["signed water mass"]) < 0).mean()
    )
    expected = 1.0 - np.exp(-rate * dt * n_steps)
    # binomial std ~ sqrt(p(1-p)/n) ~ 0.003; allow 4 sigma
    assert abs(frozen_fraction - expected) < 4 * np.sqrt(
        expected * (1 - expected) / n_sd
    ), f"{frozen_fraction} vs {expected}"


def test_thaw_above_freezing_point():
    n_sd = 16
    formulae = Formulae(
        seed=1, particle_shape_and_density="MixedPhaseSpheres"
    )
    attributes = {
        "multiplicity": np.ones(n_sd),
        "signed water mass": np.full(n_sd, -1e-12),  # all frozen
        "freezing temperature": np.full(n_sd, 250.0),
        "__freezing_kwargs__": dict(singular=True, thaw=True),
    }
    builder, env, particulator = make_box(formulae, n_sd, attributes, T=280.0, RH=0.5)
    particulator.run(1)
    assert (np.asarray(particulator.attributes["signed water mass"]) > 0).all()
