"""Checkpoint/resume round-trips and the SciPy ODE condensation
cross-validation (model: reference
``backends/impl_numba/test_helpers/scipy_ode_condensation_solver.py``
usage in the parcel smoke suites; checkpointing is new — SURVEY.md §5)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.dynamics import (
    AmbientThermodynamics,
    Coalescence,
    Condensation,
)
from pysdm_tpu.dynamics.collisions.collision_kernels import Golovin
from pysdm_tpu.environments import Box, Parcel
from pysdm_tpu.initialisation.sampling.spectral_sampling import (
    ConstantMultiplicity,
)
from pysdm_tpu.initialisation.spectra import Exponential, Lognormal
from pysdm_tpu.physics import si
from pysdm_tpu.utils import checkpoint


def build_box(seed=44, n_sd=256):
    formulae = Formulae(seed=seed)
    env = Box(dv=1e6 * si.m**3, dt=1.0)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    x_0 = float(formulae.trivia.volume(radius=30.531 * si.um))
    builder.add_dynamic(
        Coalescence(collision_kernel=Golovin(b=1.5e3), adaptive=False)
    )
    attributes = {}
    attributes["volume"], attributes["multiplicity"] = ConstantMultiplicity(
        Exponential(norm_factor=(2**23) * 1e6, scale=x_0)
    ).sample(n_sd)
    return builder.build(attributes)


def build_parcel(seed=44, n_sd=32, scipy_solver=False):
    formulae = Formulae(seed=seed)
    env = Parcel(
        dt=1.0, mass_of_dry_air=1e3, p0=1000e2,
        initial_water_vapour_mixing_ratio=0.0158, T0=300.0, w=2.0,
    )
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation(adaptive=True))
    spectrum = Lognormal(norm_factor=1e8 * 1e3, m_mode=50e-9, s_geom=1.5)
    r_dry, n_in_dv = ConstantMultiplicity(spectrum).sample(n_sd)
    attributes = env.init_attributes(n_in_dv=n_in_dv, kappa=0.5, r_dry=r_dry)
    particulator = builder.build(attributes)
    if scipy_solver:
        from pysdm_tpu.utils.scipy_ode_condensation_solver import (
            patch_particulator,
        )

        patch_particulator(particulator)
    return particulator


class TestCheckpoint:
    @staticmethod
    def test_npz_roundtrip_resumes_identically(tmp_path):
        p1 = build_box()
        p1.run(10)
        p1.block_until_ready()
        path = tmp_path / "state.npz"
        checkpoint.save_npz(p1, path)
        p1.run(10)
        final_ref = np.asarray(p1.attributes["multiplicity"])

        p2 = build_box()
        checkpoint.restore_npz(p2, path)
        assert p2.n_steps == 10
        p2.run(10)
        final_restored = np.asarray(p2.attributes["multiplicity"])
        np.testing.assert_array_equal(final_ref, final_restored)
        np.testing.assert_array_equal(
            np.asarray(p1.attributes["water mass"]),
            np.asarray(p2.attributes["water mass"]),
        )

    @staticmethod
    def test_npz_shape_mismatch_rejected(tmp_path):
        p1 = build_box(n_sd=256)
        p1.run(1)
        path = tmp_path / "state.npz"
        checkpoint.save_npz(p1, path)
        p2 = build_box(n_sd=128)
        with pytest.raises(ValueError, match="shape mismatch"):
            checkpoint.restore_npz(p2, path)

    @staticmethod
    def test_orbax_roundtrip(tmp_path):
        p1 = build_parcel()
        p1.run(5)
        p1.block_until_ready()
        directory = tmp_path / "ckpt"
        checkpoint.save_orbax(p1, directory)
        p2 = build_parcel()
        checkpoint.restore_orbax(p2, directory)
        assert p2.n_steps == 5
        np.testing.assert_array_equal(
            np.asarray(p1.attributes["water mass"]),
            np.asarray(p2.attributes["water mass"]),
        )
        np.testing.assert_allclose(
            p1.get_env("T"), p2.get_env("T"), rtol=0
        )


class TestScipyOdeSolver:
    @staticmethod
    def test_cross_validates_implicit_solver():
        """the bespoke implicit solver and an independent adaptive ODE
        integration agree on the parcel activation transient"""
        n_steps = 200
        p_impl = build_parcel(scipy_solver=False)
        p_impl.run(n_steps)
        p_scipy = build_parcel(scipy_solver=True)
        p_scipy.run(n_steps)

        T_i, T_s = float(p_impl.get_env("T")[0]), float(
            p_scipy.get_env("T")[0]
        )
        qv_i, qv_s = float(p_impl.get_env("qv")[0]), float(
            p_scipy.get_env("qv")[0]
        )
        np.testing.assert_allclose(T_i, T_s, rtol=1e-4)
        np.testing.assert_allclose(qv_i, qv_s, rtol=5e-3)
        lw_i = float(
            (
                np.asarray(p_impl.attributes["multiplicity"])
                * np.asarray(p_impl.attributes["water mass"])
            ).sum()
        )
        lw_s = float(
            (
                np.asarray(p_scipy.attributes["multiplicity"])
                * np.asarray(p_scipy.attributes["water mass"])
            ).sum()
        )
        np.testing.assert_allclose(lw_i, lw_s, rtol=2e-2)


class TestDerivedAttributes:
    @staticmethod
    def test_equilibrium_saturation_tracks_ambient_rh():
        """haze droplets at Koehler equilibrium have RH_eq ~ ambient RH
        (reference ``attributes/physics/equilibrium_saturation.py``)"""
        p = build_parcel(n_sd=16)
        p.run(5)
        es = np.asarray(p.attributes["equilibrium saturation"])
        rh = float(p.get_env("RH")[0])
        assert np.isfinite(es).all()
        np.testing.assert_allclose(es, rh, rtol=0.02)
        # alias parity
        np.testing.assert_array_equal(
            np.asarray(p.attributes["hygroscopicity"]),
            np.asarray(p.attributes["kappa"]),
        )
