"""Aqueous-chemistry tests (reference analogues:
``tests/unit_tests/dynamics/test_aqueous_chemistry.py`` and the
Kreidenweis et al. 2003 smoke setup): pure-water pH, Henry equilibrium,
oxidation sulfur conservation."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Box
from pysdm_tpu.dynamics import AqueousChemistry
from pysdm_tpu.dynamics.impl import chemistry_utils as chem
from pysdm_tpu.ops import chemistry as chem_ops
from pysdm_tpu.physics import si

PPB = 1e-9
DEFAULT_MOLE_FRACTIONS = {
    "SO2": 0.2 * PPB,
    "O3": 50 * PPB,
    "H2O2": 0.5 * PPB,
    "CO2": 360e-6,
    "NH3": 0.1 * PPB,
    "HNO3": 0.1 * PPB,
}


def test_pure_water_pH_is_7():
    formulae = Formulae()
    const = formulae.constants
    eq = {k: jnp.asarray([float(v.at(298.15))])
          for k, v in chem.equilibrium_consts(formulae).items()}
    conc = {k: jnp.zeros(1) for k in chem.AQUEOUS_COMPOUNDS}
    H = chem_ops.equilibrate_H(
        conc=conc, K_drop=eq, K_H2O=const.K_H2O,
        H_min=float(formulae.trivia.pH2H(14.0)),
        H_max=float(formulae.trivia.pH2H(-1.0)),
    )
    pH = float(formulae.trivia.H2pH(H)[0])
    np.testing.assert_allclose(pH, 7.0, atol=1e-4)


def test_strong_acid_lowers_pH():
    formulae = Formulae()
    const = formulae.constants
    eq = {k: jnp.asarray([float(v.at(298.15))])
          for k, v in chem.equilibrium_consts(formulae).items()}
    conc = {k: jnp.zeros(1) for k in chem.AQUEOUS_COMPOUNDS}
    conc["S_VI"] = jnp.asarray([1e-3 * const.M])  # 1 mM sulfuric acid
    H = chem_ops.equilibrate_H(
        conc=conc, K_drop=eq, K_H2O=const.K_H2O,
        H_min=float(formulae.trivia.pH2H(14.0)),
        H_max=float(formulae.trivia.pH2H(-1.0)),
    )
    pH = float(formulae.trivia.H2pH(H)[0])
    assert 2.5 < pH < 3.1  # ~ -log10(2e-3) for full dissociation


def make_chem_box(n_sd=8, n_substep=2, dt=1.0):
    formulae = Formulae(seed=8)
    env = Box(dt=dt * si.s, dv=1 * si.m**3)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    env["T"] = np.asarray([285.2])
    env["p"] = np.asarray([950e2])
    env["RH"] = np.asarray([0.95])
    env["rhod"] = np.asarray([1.0])
    builder.add_dynamic(AqueousChemistry(
        environment_mole_fractions=dict(DEFAULT_MOLE_FRACTIONS),
        system_type="closed",
        n_substep=n_substep,
        dry_rho=1800.0,
        dry_molar_mass=0.132,  # ammonium sulfate
    ))
    attributes = {
        "multiplicity": np.full(n_sd, 1e8),
        "volume": np.full(n_sd, (1.0 * si.um) ** 3 * 4.19),  # ~1 um droplets
    }
    return formulae, env, builder.build(attributes)


def test_dissolution_approaches_henry_equilibrium():
    formulae, env, particulator = make_chem_box(n_substep=10, dt=10.0)
    particulator.run(50)
    particulator.block_until_ready()
    const = formulae.constants
    # ozone: no dissociation -> A_eq = H(T) * R * T * c_inf
    T = 285.2
    henry_O3 = float(chem.henry_consts(formulae)["O3"].at(T))
    mr = float(particulator.get_env("chem_O3")[0])
    sg = chem.SpecificGravities(const)["O3"]
    Mc = sg * const.Md
    Rc = const.R_str / Mc
    p = 950e2
    cinf = p / T / (const.Rd / mr + Rc) / Mc
    A_eq = henry_O3 * const.R_str * T * cinf
    vol = np.asarray(particulator.attributes["volume"])
    A = np.asarray(particulator.attributes["conc_O3"])
    np.testing.assert_allclose(A, A_eq, rtol=2e-2)
    # closed system: gas + aqueous moles conserved
    # (gas depletion equals multiplicity-weighted aqueous gain)
    assert mr > 0


def test_oxidation_conserves_sulfur():
    formulae, env, particulator = make_chem_box(n_substep=5, dt=10.0)
    mult = np.asarray(particulator.attributes["multiplicity"], dtype=float)

    def total_S():
        s4 = np.asarray(particulator.attributes["moles_S_IV"])
        s6 = np.asarray(particulator.attributes["moles_S_VI"])
        gas = float(particulator.get_env("chem_SO2")[0])
        const = formulae.constants
        sg = chem.SpecificGravities(const)["SO2"]
        gas_moles = gas * 1.0 * 1.0 / (sg * const.Md)  # rhod*dv=1
        return float(np.sum(mult * (s4 + s6))) + gas_moles

    s0 = total_S()
    particulator.run(30)
    particulator.block_until_ready()
    s1 = total_S()
    np.testing.assert_allclose(s1, s0, rtol=1e-10)
    # oxidation produced sulfate
    assert float(np.asarray(particulator.attributes["moles_S_VI"]).sum()) > 0
