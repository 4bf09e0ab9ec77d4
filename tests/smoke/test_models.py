"""Smoke tests for the paper-reproduction models layer
(model: the reference's examples-suite tests,
``tests/smoke_tests/*/*`` + ``tests/examples_tests``): each headline
configuration builds, runs, and reproduces its paper's qualitative result."""

import numpy as np
import pytest

from pysdm_tpu.initialisation import spectra
from pysdm_tpu.physics import Formulae, si


class TestShima2009:
    @staticmethod
    def test_spectrum_evolution_matches_golovin_analytic():
        from pysdm_tpu.models import shima_et_al_2009 as m

        settings = m.Settings(steps=[0, 1200])
        settings.n_sd = 2**12
        vals, wall_time = m.run(settings)
        assert wall_time > 0
        r_mid = np.sqrt(
            settings.radius_bins_edges[:-1] * settings.radius_bins_edges[1:]
        )
        analytic = m.golovin_analytic_dvdlnr(
            r_mid, 1200.0, b=1.5e3, x_0=settings.X0,
            n_part=settings.n_part, rho=settings.rho,
        )
        measured = vals[1200]
        scale = analytic.max()
        rmse = np.sqrt(np.mean(((measured - analytic) / scale) ** 2))
        assert rmse < 0.15
        # mass conservation across output steps
        dlnr = np.diff(np.log(settings.radius_bins_edges))
        m0 = (vals[0] * dlnr).sum()
        m1 = (vals[1200] * dlnr).sum()
        np.testing.assert_allclose(m0, m1, rtol=5e-2)


class TestBerry1967:
    @staticmethod
    def test_collection_growth():
        from pysdm_tpu.models import berry_1967 as m

        settings = m.Settings(steps=[0, 400])
        settings.n_sd = 2**11
        vals, _ = m.run(settings)
        r_mid = np.sqrt(
            settings.radius_bins_edges[:-1] * settings.radius_bins_edges[1:]
        )
        mean_r0 = (vals[0] * r_mid).sum() / vals[0].sum()
        mean_r1 = (vals[400] * r_mid).sum() / vals[400].sum()
        assert mean_r1 > mean_r0  # hydrodynamic collection shifts mass up


class TestDeJongMackay2023:
    @staticmethod
    def test_breakup_rates_reported():
        from pysdm_tpu.models import dejong_mackay_et_al_2023 as m

        settings = m.Settings0D()
        settings.n_sd = 2**9
        settings._steps = [0, 16]
        out = m.run_box_breakup(settings, return_nv=True)
        collision, deficit, coalescence, breakup = out.rates[-1]
        assert collision > 0 and coalescence > 0 and breakup > 0
        np.testing.assert_allclose(
            collision, coalescence + breakup, rtol=1e-6
        )
        assert out.y.shape == (2, len(settings.radius_bins_edges) - 1)


class TestPyrcel:
    @staticmethod
    def test_supersaturation_peak_and_activation():
        from pysdm_tpu.models.pyrcel import Settings, Simulation

        settings = Settings(
            dz=10 * si.m,
            n_sd_per_mode=(16, 16),
            aerosol_modes_by_kappa={
                0.54: spectra.Lognormal(
                    norm_factor=850 / si.cm**3, m_mode=15 * si.nm, s_geom=1.6
                ),
                1.2: spectra.Lognormal(
                    norm_factor=10 / si.cm**3, m_mode=850 * si.nm, s_geom=1.2
                ),
            },
            vertical_velocity=1.0 * si.m / si.s,
            initial_pressure=775 * si.mbar,
            initial_temperature=274 * si.K,
            initial_relative_humidity=0.98,
            displacement=250 * si.m,
            formulae=Formulae(constants={"MAC": 0.3}, seed=44),
        )
        sim = Simulation(settings)
        out = sim.run()
        smax = np.nanmax(out["products"]["S_max"])
        assert 0.001 < smax < 0.01  # ~0.4-0.8% peak supersaturation
        # coarse mode (kappa=1.2, 850nm) activates: final wet radii large
        vol_final = out["attributes"]["volume"][-1]
        r_final = (3 * vol_final / 4 / np.pi) ** (1 / 3)
        assert (r_final[16:] > 1e-6).all()


class TestAbdulRazzakGhan2000:
    @staticmethod
    def test_mode1_activated_fraction():
        from pysdm_tpu.models.abdul_razzak_ghan_2000 import run_parcel

        out = run_parcel(
            w=0.5, sol2=1.0, N2=100 / si.cm**3, rad2=50 * si.nm,
            n_sd_per_mode=16, n_steps=30,
        )
        # identical modes -> identical activated fractions
        np.testing.assert_allclose(
            out.activated_fraction_S[0], out.activated_fraction_S[1],
            atol=0.12,
        )
        assert 0.05 < out.activated_fraction_S[0] < 0.95
        # S- and V-based activation diagnostics agree roughly
        np.testing.assert_allclose(
            out.activated_fraction_S, out.activated_fraction_V, atol=0.25
        )


class TestLowe2019:
    @staticmethod
    @pytest.mark.parametrize("forg", (0.2,))
    def test_film_model_increases_cdnc(forg):
        from pysdm_tpu.models.lowe_et_al_2019 import (
            AerosolMarine,
            Settings,
            Simulation,
        )

        cdnc = {}
        for model in ("Constant", "CompressedFilmOvadnevaite"):
            settings = Settings(
                dz=5.0,
                n_sd_per_mode=16,
                aerosol=AerosolMarine(
                    water_molar_volume=18.015e-3 / 1000.0, Forg=forg
                ),
                model=model,
            )
            sim = Simulation(settings)
            out = sim.run()
            cdnc[model] = out["CDNC"][-1]
        # the paper's headline effect: organic-film surface tension
        # lowers the activation barrier -> more droplets activate
        assert cdnc["CompressedFilmOvadnevaite"] > cdnc["Constant"]


class TestKreidenweis2003:
    @staticmethod
    def test_in_cloud_pH_and_SO2_depletion():
        from pysdm_tpu.models.kreidenweis_et_al_2003 import (
            Settings,
            Simulation,
        )

        settings = Settings(dt=10.0, n_sd=16, n_substep=5)
        settings.t_max = 400.0
        sim = Simulation(settings)
        out = sim.run()
        assert 3.0 < out["pH"][-1] < 6.0  # in-cloud droplet acidity
        assert out["gas_S_IV"][-1] < out["gas_S_IV"][0]  # SO2 consumed
        assert out["liquid water mixing ratio"][-1] > 1e-5  # cloud formed


class TestAlpertKnopf2016:
    @staticmethod
    def test_constant_jhet_exponential_decay():
        from pysdm_tpu.models.alpert_and_knopf_2016 import simulation
        from pysdm_tpu.initialisation import spectra as spc

        J_het = 1e7  # 1/m2/s
        A = 1e-9  # m2 per droplet
        dt, nt = 10.0, 20
        spec = spc.Lognormal(norm_factor=1000 / 1e-6, m_mode=A, s_geom=1.0)
        f_ufz, a_tot = simulation(
            constants={"J_HET": J_het},
            seed=1, n_sd=1000, time_step=dt, volume=1e-6,
            spectrum=spec, droplet_volume=1e-18, multiplicity=1,
            total_time=dt * nt, number_of_real_droplets=1000,
            cooling_rate=0,
            heterogeneous_ice_nucleation_rate="Constant",
            initial_temperature=240.0,
        )
        f = np.asarray(f_ufz)
        t = dt * np.arange(len(f))
        expected = np.exp(-J_het * A * t)
        assert abs(f[-1] - expected[-1]) < 0.1
        assert (np.diff(f) <= 0).all()  # monotone freezing
        assert a_tot[-1] < a_tot[0]  # unfrozen surface area shrinks


class TestShipwayHill2012:
    @staticmethod
    def test_column_cloud_formation():
        from pysdm_tpu.models.shipway_and_hill_2012 import (
            Settings,
            Simulation,
        )

        # the updraft rho*w peaks at t_1/2 = 300 s; with the particle
        # reservoir and the reference qv profile (0.0138 at 740 m) the
        # column saturates shortly after the peak
        settings = Settings(
            n_sd_per_gridbox=8, dz=100.0, z_max=3000.0,
            t_max=600.0, dt=2.0,
        )
        sim = Simulation(settings)
        out = sim.run(steps_per_output=60)
        assert np.max(out["RH"][-1]) > 1.0  # updraft supersaturates
        assert np.max(out["qc"][-1]) > 1e-5  # cloud water forms
        T = out["T"][-1]
        assert (T > 250).all() and (T < 320).all()


class TestArabasShima2017:
    @staticmethod
    def test_activation_hysteresis():
        from pysdm_tpu.models.arabas_and_shima_2017 import (
            Settings,
            Simulation,
        )

        settings = Settings(
            w_avg=1.0, N_STP=50 / si.cm**3, r_dry=0.1 * si.um,
            mass_of_dry_air=1e3 * si.kg, n_output=100,
        )
        sim = Simulation(settings)
        out = sim.run()
        rh = np.asarray(out["RH"])
        r = np.asarray(out["r"])
        assert rh.max() > 1.0  # supersaturation reached on updraft
        assert r.max() > 1e-6  # droplet activates
        # downdraft phase brings RH back below saturation
        assert rh[-1] < rh.max()


class TestGrabowskiPawlowska2023:
    @staticmethod
    @pytest.mark.parametrize("aerosol", ("pristine", "polluted"))
    def test_activation_and_supersaturation(aerosol):
        from pysdm_tpu.models.grabowski_and_pawlowska_2023 import (
            Settings,
            Simulation,
        )

        settings = Settings(
            aerosol=aerosol, vertical_velocity=1.0 * si.m / si.s,
            dt=2 * si.s, n_sd=32, displacement=100 * si.m,
        )
        sim = Simulation(settings)
        out = sim.run()
        s_max = np.nanmax(out["products"]["S_max"])  # RH - 1
        assert 0.0 < s_max < 0.05  # supersaturation peak within sane bounds
        # polluted aerosol has more/larger CCN -> droplets grow; volume rises
        v0 = np.asarray(out["attributes"]["volume"][0])
        v1 = np.asarray(out["attributes"]["volume"][-1])
        assert v1.sum() > v0.sum()
        assert np.isfinite(out["products"]["ripening rate"]).all()


class TestNiedermeier2014:
    @staticmethod
    def test_immersion_freezing_produces_ice():
        from pysdm_tpu.models.niedermeier_et_al_2014 import (
            Settings,
            Simulation,
        )

        # Constant J_het large enough to freeze the IN mode within the
        # ascent (the paper's ABIFM illite fit needs colder temperatures
        # and far longer integrations than a smoke test affords)
        settings = Settings(
            formulae=Formulae(
                seed=44,
                particle_shape_and_density="MixedPhaseSpheres",
                heterogeneous_ice_nucleation_rate="Constant",
                constants={"J_HET": 1e12},
            ),
            initial_temperature=250.0 * si.K,
            timestep=5 * si.s,
            ccn_sampling_n=5,
            in_sampling_n=4,
        )
        sim = Simulation(settings)
        out = sim.run()
        iwc = np.asarray(out["ice water content"])
        assert iwc[0] == 0.0
        assert iwc[-1] > 0.0  # immersion freezing produced ice
        T = np.asarray(out["T"])
        assert T[-1] < T[0]  # ascent cools the parcel


class TestJarugaPawlowska2018:
    @staticmethod
    def test_fig2_convergence_point():
        from pysdm_tpu.models.jaruga_and_pawlowska_2018 import (
            run_convergence_point,
        )

        s_max, n_c, ph, sulfate_ppt = run_convergence_point(
            16, dt=2 * si.s, n_substep=1, output_interval=50 * si.s
        )
        assert 0.1 < s_max < 1.0  # % supersaturation (paper fig 2: ~0.24-0.61)
        assert 4.0 < ph < 6.0  # average cloud-water pH (paper: ~4.7-5.2)
        assert sulfate_ppt > 0.0  # S(VI) is produced


class TestBieli2022:
    @staticmethod
    def test_moments_evolution():
        from pysdm_tpu.models import bieli_et_al_2022 as m

        settings = m.Settings()
        settings.n_sd = 2**10
        settings._steps = [0, 30]
        out = m.run(settings, coal_eff=settings.coal_effs[2])
        m0, m1 = np.asarray(out["M0"]), np.asarray(out["M1"])
        assert m0[-1] < m0[0]  # net coalescence reduces droplet count
        np.testing.assert_allclose(m1[-1], m1[0], rtol=1e-6)  # volume conserved


class TestYang2018:
    @staticmethod
    def test_cloud_cycles_activate_and_deactivate():
        from pysdm_tpu.models.yang_et_al_2018 import Settings, Simulation

        settings = Settings(
            n_sd=32, total_time=2400.0, dt_max=5.0
        )
        settings.n_steps = int(settings.total_time / 5.0)
        sim = Simulation(settings)
        out = sim.run()
        S = np.asarray(out["S"])
        assert S.max() > 0.0  # initial ascent supersaturates
        # after t0 the square-wave downdraft brings RH back down
        i_t0 = np.searchsorted(np.asarray(out["t"]), 1200.0)
        assert S[i_t0:].min() < S.max()
        z = np.asarray(out["z"])
        assert z.max() > 1100.0  # climbed ~600 m from z0=600 m
        assert z[-1] < z.max()  # oscillation descends again
        r_act = np.asarray(out["r_act"])
        assert np.nanmax(r_act) > 1e-6  # droplets activated


class TestJensenNugent2017:
    @staticmethod
    def test_sc_parcel_activation():
        from pysdm_tpu.models.jensen_and_nugent_2017 import (
            Settings,
            Simulation,
        )

        settings = Settings(aerosol="pristine", cloud_type="Sc", dt=2.0)
        sim = Simulation(settings, gccn=True, n_sd_non_gccn=24)
        # 1200 s of 0.4 m/s ascent lifts the parcel ~480 m past cloud base
        out = sim.run(n_steps=600, steps_per_output_interval=100)
        s_max = np.nanmax(out["products"]["S_max"])
        assert 0.0 < s_max < 0.05  # supersaturation reached, sane magnitude
        r_act = np.asarray(out["products"]["r_mean_act"])
        assert np.nanmax(r_act) > 1e-6  # droplets activated
        # GCCN tail: largest sea-salt particles grow beyond 10 um quickly
        assert np.asarray(out["attributes"]["radius"][-1]).max() > 10e-6
        z = np.asarray(out["products"]["z"])
        assert z[-1] > z[0]  # ascending during the first 300 s


class TestSeeding:
    @staticmethod
    def test_seeding_injects_and_rains():
        from pysdm_tpu.models.seeding import Settings, Simulation

        def injection_rate(time):
            # inject 1 super-droplet per second within a 100 s window
            return np.where((time >= 300.0) & (time < 400.0), 1.0, 0.0)

        settings = Settings(
            super_droplet_injection_rate=injection_rate,
            formulae=Formulae(seed=44),
            n_sd_initial=64,
            n_sd_seeding=16,
        )
        sim = Simulation(settings)
        out = sim.run()
        sd_count = out["products"]["sd_count"]
        assert sd_count[0] == 64
        assert sd_count[-1] > 64  # seeding injected super-droplets
        assert np.nanmax(out["products"]["r_eff"]) > 1e-6  # droplets grew
