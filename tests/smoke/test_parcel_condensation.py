"""Parcel condensation/activation smoke tests (model: reference
``tests/unit_tests/dynamics/condensation/test_parcel_sanity_checks.py`` and
the parcel smoke suites ``tests/smoke_tests/parcel_a..d``)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.dynamics import AmbientThermodynamics, Condensation
from pysdm_tpu.environments import Parcel
from pysdm_tpu.initialisation.sampling.spectral_sampling import ConstantMultiplicity
from pysdm_tpu.initialisation.spectra import Lognormal


def run_parcel(*, w=2.0, n_steps=1000, n_sd=64, qv0=0.0158, T0=300.0,
               p0=1000e2, n_cc=1e8, adaptive=True, dt=1.0, **formulae_kwargs):
    formulae = Formulae(seed=44, **formulae_kwargs)
    env = Parcel(
        dt=dt, mass_of_dry_air=1e3, p0=p0,
        initial_water_vapour_mixing_ratio=qv0, T0=T0, w=w,
    )
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation(adaptive=adaptive))
    spectrum = Lognormal(norm_factor=n_cc * 1e3, m_mode=50e-9, s_geom=1.5)
    r_dry, n_in_dv = ConstantMultiplicity(spectrum).sample(n_sd)
    attributes = env.init_attributes(n_in_dv=n_in_dv, kappa=0.5, r_dry=r_dry)
    particulator = builder.build(attributes)
    particulator.run(n_steps)
    return particulator


class TestParcelCondensation:
    @staticmethod
    def test_activation_and_water_budget():
        p = run_parcel()
        assert bool(p.get_counter("condensation_success").all())
        RH_max = float(p.get_counter("condensation_RH_max")[0])
        # supersaturation peak: small positive (sub-5%) overshoot at cloud base
        assert 1.0005 < RH_max < 1.05
        qv = float(p.get_env("qv")[0])
        lwmr = float(
            (p.attributes["multiplicity"] * p.attributes["water mass"]).sum()
        ) / 1e3
        p0_ = run_parcel(n_steps=0)
        lwmr0 = float(
            (p0_.attributes["multiplicity"] * p0_.attributes["water mass"]).sum()
        ) / 1e3
        # total water conserved: qv + liquid invariant (incl. initial haze)
        np.testing.assert_allclose(qv + lwmr, 0.0158 + lwmr0, rtol=1e-9)
        assert lwmr > 1e-4  # cloud formed
        # droplets grew to cloud-droplet sizes
        assert 5e-6 < float(np.mean(p.attributes["radius"])) < 50e-6

    @staticmethod
    def test_dry_then_moist_lapse_rate():
        """below the LCL the parcel cools at the dry-adiabatic rate g/cp;
        above it the rate is visibly smaller"""
        p_dry = run_parcel(n_steps=100)  # 200 m ascent, still subsaturated
        dT_dz_dry = (300.0 - float(p_dry.get_env("T")[0])) / float(
            p_dry.get_env("z")[0]
        )
        np.testing.assert_allclose(dT_dz_dry, 9.8e-3, rtol=2e-2)
        p_moist = run_parcel(n_steps=1000)
        T1, z1 = float(p_moist.get_env("T")[0]), float(p_moist.get_env("z")[0])
        p_mid = run_parcel(n_steps=500)
        T0_, z0_ = float(p_mid.get_env("T")[0]), float(p_mid.get_env("z")[0])
        dT_dz_moist = (T0_ - T1) / (z1 - z0_)
        assert dT_dz_moist < 0.6 * 9.8e-3

    @staticmethod
    def test_subsaturated_haze_equilibrium():
        """with a weak updraft and short run, droplets stay near Koehler
        equilibrium and qv is unchanged"""
        p = run_parcel(w=0.01, n_steps=50)
        assert float(p.get_counter("condensation_RH_max")[0]) < 1.0
        np.testing.assert_allclose(float(p.get_env("qv")[0]), 0.0158, rtol=1e-7)

    @staticmethod
    @pytest.mark.parametrize("adaptive", (True, False))
    def test_adaptive_flag(adaptive):
        p = run_parcel(n_steps=450, adaptive=adaptive)
        assert bool(p.get_counter("condensation_success").all())
        nsub = int(p.get_counter("condensation_n_substeps")[0])
        if adaptive:
            assert nsub >= 1
        else:
            assert nsub == 1


class TestEquilibrateWetRadii:
    @staticmethod
    def test_wet_radius_at_equilibrium():
        formulae = Formulae(seed=1)
        env = Parcel(
            dt=1.0, mass_of_dry_air=1e3, p0=1000e2,
            initial_water_vapour_mixing_ratio=0.0158, T0=300.0, w=1.0,
        )
        builder = Builder(n_sd=8, backend=CPU(formulae), environment=env)
        builder.add_dynamic(AmbientThermodynamics())
        builder.add_dynamic(Condensation())
        r_dry = np.logspace(np.log10(10e-9), np.log10(500e-9), 8)
        attributes = env.init_attributes(
            n_in_dv=np.full(8, 1e6), kappa=0.5, r_dry=r_dry
        )
        r_wet = np.asarray(formulae.trivia.radius(attributes["volume"]))
        assert (r_wet > r_dry).all()
        # RH_eq(r_wet) == ambient RH at equilibrium
        T = float(env["T"][0])
        RH = float(env["RH"][0])
        kappa = attributes["kappa times dry volume"] / np.asarray(
            formulae.trivia.volume(radius=r_dry)
        )
        sgm = formulae.constants.sgm_w
        RH_eq = np.asarray(
            formulae.hygroscopicity.RH_eq(r_wet, T, kappa, r_dry**3, sgm)
        )
        np.testing.assert_allclose(RH_eq, RH, rtol=1e-4)


class TestVentilation:
    """Reynolds-number attribute + ventilation coefficient (reference
    ``attributes/physics/reynolds_number.py:8-34`` — Re computed from
    relative fall velocity and ambient air density/viscosity whenever
    ventilation != Neglect)."""

    @staticmethod
    def test_reynolds_number_matches_hand_computed():
        p = run_parcel(n_steps=600, ventilation="Froessling1938")
        resolver = p._resolver
        particles = p.sim_state["particles"]
        env = p.sim_state["env"]
        re = np.asarray(
            resolver.get(particles, "Reynolds number", env=env), dtype=float
        )
        radius = np.asarray(p.attributes["radius"], dtype=float)
        v_term = np.asarray(
            resolver.get(particles, "relative fall velocity"), dtype=float
        )
        cell = np.asarray(particles.cell_id)
        rho_air = np.asarray(env["air_density"], dtype=float)[cell]
        eta_air = np.asarray(env["air_viscosity"], dtype=float)[cell]
        expected = 2 * radius * v_term * rho_air / eta_air
        assert (re > 0).all()
        np.testing.assert_allclose(re, expected, rtol=1e-6)

    @staticmethod
    def test_reynolds_number_zero_when_neglect():
        p = run_parcel(n_steps=10)  # default ventilation == Neglect
        re = np.asarray(
            p._resolver.get(
                p.sim_state["particles"], "Reynolds number",
                env=p.sim_state["env"],
            )
        )
        assert (re == 0).all()

    @staticmethod
    def test_froessling_differs_from_neglect():
        """with ventilation on, droplet growth is measurably faster and the
        coefficient matches 1 + 0.276 sqrt(Re) cbrt(Sc) hand-computed"""
        p_vent = run_parcel(n_steps=600, ventilation="Froessling1938")
        p_negl = run_parcel(n_steps=600)
        r_vent = float(np.mean(np.asarray(p_vent.attributes["radius"])))
        r_negl = float(np.mean(np.asarray(p_negl.attributes["radius"])))
        assert r_vent != r_negl

        formulae = p_vent.formulae
        particles = p_vent.sim_state["particles"]
        env = p_vent.sim_state["env"]
        re = np.asarray(
            p_vent._resolver.get(particles, "Reynolds number", env=env),
            dtype=float,
        )
        cell = np.asarray(particles.cell_id)
        T = np.asarray(env["T"], dtype=float)[cell]
        p_amb = np.asarray(env["p"], dtype=float)[cell]
        rho_air = np.asarray(env["air_density"], dtype=float)[cell]
        eta_air = np.asarray(env["air_viscosity"], dtype=float)[cell]
        D = np.asarray(formulae.diffusion_thermics.D(T, p_amb), dtype=float)
        Sc = np.asarray(
            formulae.trivia.air_schmidt_number(
                dynamic_viscosity=eta_air, diffusivity=D, density=rho_air
            ),
            dtype=float,
        )
        vent = np.asarray(
            formulae.ventilation.ventilation_coefficient(
                sqrt_re_times_cbrt_sc=np.sqrt(re) * np.cbrt(Sc)
            ),
            dtype=float,
        )
        expected = 1.0 + 0.276 * np.sqrt(re) * np.cbrt(Sc)
        np.testing.assert_allclose(vent, expected, rtol=1e-6)
        assert (vent > 1.0).all()
