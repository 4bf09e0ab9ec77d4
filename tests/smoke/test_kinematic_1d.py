"""1D kinematic column smoke test (config #4: reference
``examples/PySDM_examples/Shipway_and_Hill_2012`` — prescribed time-varying
updraft, MPDATA qv advection, condensation, displacement/sedimentation,
coalescence). Mirrors the reference's physics-level regression style
(``tests/smoke_tests/kinematic_1d/``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Kinematic1D
from pysdm_tpu.dynamics import (
    AmbientThermodynamics,
    Coalescence,
    Condensation,
    Displacement,
    EulerianAdvection,
)
from pysdm_tpu.dynamics.eulerian_advection import MPDATA_1D
from pysdm_tpu.dynamics.collisions.collision_kernels import Geometric
from pysdm_tpu.impl.mesh import Mesh
from pysdm_tpu.initialisation import spectra
from pysdm_tpu.initialisation.sampling.spectral_sampling import ConstantMultiplicity
from pysdm_tpu.initialisation.sampling.spatial_sampling import Pseudorandom
from pysdm_tpu.physics import si


@pytest.fixture(scope="module")
def column_simulation():
    nz, dz, dt = 32, 50 * si.m, 2 * si.s
    n_sd = 32 * 16
    t_1 = 300 * si.s
    rho_times_w_1 = 2.0  # kg/m^3 * m/s
    formulae = Formulae(seed=7)
    const = formulae.constants

    def rho_times_w(t):
        return rho_times_w_1 * jnp.sin(jnp.pi * t / t_1) * (t < t_1)

    # idealised stable profiles (simplified vs the reference's interp1d tables)
    def thd_of_z(z):
        return 297.9 + 13.0 * np.maximum(z - 740.0, 0.0) / (3260.0 - 740.0)

    def rhod_of_z(z):
        return 1.2 * np.exp(-z / 8000.0)

    def qv_of_z(z):
        return np.interp(z, [0.0, 740.0, 3260.0], [0.015, 0.0138, 0.0024])

    mesh = Mesh(grid=(nz,), size=(nz * dz,))
    env = Kinematic1D(
        dt=dt,
        mesh=mesh,
        thd_of_z=thd_of_z,
        rhod_of_z=rhod_of_z,
        water_vapour_mixing_ratio_of_z=qv_of_z,
    )
    z_faces = dz * np.arange(nz + 1)
    z_centres = dz * (np.arange(nz) + 0.5)
    mpdata = MPDATA_1D(
        nz=nz,
        dt=dt,
        advector_of_t=lambda t: rho_times_w(t) * dt / dz,
        g_factor_z=rhod_of_z(z_centres),
        g_factor_z_faces=rhod_of_z(z_faces),
    )
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation(adaptive=True))
    builder.add_dynamic(EulerianAdvection(mpdata))
    builder.add_dynamic(
        Coalescence(collision_kernel=Geometric(), adaptive=True)
    )
    builder.add_dynamic(
        Displacement(enable_sedimentation=True, precipitation_counting_level_index=0)
    )
    attributes = env.init_attributes(
        spatial_discretisation=Pseudorandom(),
        spectral_discretisation=ConstantMultiplicity(
            spectra.Lognormal(
                norm_factor=50 / si.cm**3 / const.rho_STP,
                m_mode=0.04 * si.um,
                s_geom=1.4,
            )
        ),
        kappa=1.0,
        seed=7,
    )
    particulator = builder.build(attributes)
    return particulator


def liquid_water_path(p):
    mult = p.attributes["multiplicity"].astype(float)
    wm = p.attributes["water mass"]
    return float(np.sum(mult * wm))


def test_column_runs_and_activates_cloud(column_simulation):
    p = column_simulation
    lwp0 = liquid_water_path(p)
    rh0 = p.get_env("RH")
    p.run(60)  # 120 s — updraft phase
    p.block_until_ready()
    assert np.asarray(p.get_counter("condensation_success")).all()
    rh = p.get_env("RH")
    assert np.isfinite(rh).all() and rh.max() < 1.15
    # the initially supersaturated layer is relaxed toward RH ~ 1 by
    # condensational growth (activation consumed the supersaturation)
    assert rh.max() < rh0.max() and rh.max() > 1.0
    lwp1 = liquid_water_path(p)
    assert lwp1 > 2 * lwp0, "condensational growth should add liquid water"
    # vapour stays positive and bounded
    qv = p.get_env("qv")
    assert (qv > 0).all() and qv.max() < 0.02


def test_column_water_budget(column_simulation):
    """total water (vapour + liquid) change matches precipitation loss
    + boundary vapour flux (small over the run)"""
    p = column_simulation
    rhod = p.get_env("rhod")
    dv = p.mesh.dv
    vapour = float(np.sum(rhod * p.get_env("qv") * dv))
    liquid = liquid_water_path(p)
    total0 = vapour + liquid
    p.run(30)
    p.block_until_ready()
    vapour1 = float(np.sum(rhod * p.get_env("qv") * dv))
    liquid1 = liquid_water_path(p)
    precip = float(np.sum(p.get_counter("precipitated_mass")))
    total1 = vapour1 + liquid1 + precip
    np.testing.assert_allclose(total1, total0, rtol=0.05)
