"""Displacement dynamic tests (reference analogue:
``tests/unit_tests/dynamics/displacement/``): advection with prescribed
courant fields, sedimentation, precipitation accounting, out-of-column flag."""

import numpy as np
import jax.numpy as jnp

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Kinematic1D
from pysdm_tpu.dynamics import Displacement
from pysdm_tpu.impl.mesh import Mesh
from pysdm_tpu.physics import si


def make_column(n_sd=8, nz=10, dz=100.0, dt=1.0, enable_sedimentation=False,
                positions_z=None, volume_um3=20.0):
    mesh = Mesh(grid=(nz,), size=(nz * dz,))
    env = Kinematic1D(
        dt=dt,
        mesh=mesh,
        thd_of_z=lambda z: np.full_like(z, 300.0),
        rhod_of_z=lambda z: np.full_like(z, 1.0),
        water_vapour_mixing_ratio_of_z=lambda z: np.full_like(z, 1e-3),
    )
    builder = Builder(n_sd=n_sd, backend=CPU(Formulae(seed=4)), environment=env)
    builder.add_dynamic(Displacement(
        enable_sedimentation=enable_sedimentation,
        precipitation_counting_level_index=0,
    ))
    if positions_z is None:
        positions_z = np.linspace(0.5, nz - 0.5, n_sd)
    positions = positions_z[None, :]
    cell_id, cell_origin, position_in_cell = mesh.cellular_attributes(positions)
    attributes = {
        "multiplicity": np.full(n_sd, 1000.0),
        "volume": np.full(n_sd, (volume_um3 * si.um) ** 3),
        "cell id": cell_id,
        "cell origin": cell_origin,
        "position in cell": position_in_cell,
    }
    particulator = builder.build(attributes)
    return particulator


def set_courant(particulator, value):
    nz = particulator.mesh.grid[0]
    particulator.sim_state["env"]["courant_0"] = jnp.full(
        nz + 1, value, dtype=particulator.dtype
    )


def z_abs(particulator):
    return (
        particulator.attributes["cell origin"][-1]
        + particulator.attributes["position in cell"][-1]
    )


def test_uniform_updraft_advection():
    p = make_column()
    z0 = z_abs(p)
    set_courant(p, 0.4)
    p.run(1)
    # uniform courant: implicit-in-space displacement == courant
    alive = p.attributes["multiplicity"] > 0
    np.testing.assert_allclose(z_abs(p)[alive], (z0 + 0.4)[alive], rtol=1e-12)


def test_out_of_column_particles_die():
    p = make_column(positions_z=np.linspace(9.0, 9.9, 8))
    set_courant(p, 0.9)
    p.run(2)
    assert (p.attributes["multiplicity"] == 0).all()


def test_sedimentation_and_precipitation():
    # still air; large drops fall with their terminal velocity
    p = make_column(
        enable_sedimentation=True,
        positions_z=np.linspace(0.2, 5.0, 8),
        volume_um3=500.0,  # ~0.5 mm drops, v_term ~ 4 m/s
        dt=10.0,
    )
    set_courant(p, 0.0)
    mult0 = p.attributes["multiplicity"].copy()
    mass0 = float(np.sum(mult0 * p.attributes["water mass"]))
    z0 = z_abs(p)
    total_precip = 0.0
    for _ in range(8):
        p.run(1)
        total_precip += float(p.get_counter("precipitated_mass")[0])
    z1 = z_abs(p)
    alive = p.attributes["multiplicity"] > 0
    assert (z1[alive] < z0[alive]).all(), "drops must fall"
    assert (~alive).any(), "some drops must have precipitated out"
    # precipitated mass accounting: dead mass == counted rainfall
    dead_mass = float(np.sum(
        np.where(alive, 0.0, mult0 * p.attributes["water mass"])
    ))
    np.testing.assert_allclose(total_precip, dead_mass, rtol=1e-12)
    assert total_precip > 0 and total_precip < mass0


def test_adaptive_substepping_activates_on_sheared_flow():
    p = make_column(nz=16)
    nz = 16
    # strongly sheared courant profile -> large delta courant -> substeps
    p.sim_state["env"]["courant_0"] = jnp.asarray(
        np.linspace(-0.45, 0.45, nz + 1), dtype=p.dtype
    )
    p.run(1)
    assert int(p.get_counter("max_n_substeps_displacement")[0]) > 1
