"""Round-2 product/physics coverage: freezing products, optical products,
parcel products, chemistry spectra, organic-film surface tension variants,
and the dry-aerosol composition helper (reference analogues:
``tests/unit_tests/products/``, ``tests/unit_tests/physics/test_surface_tension.py``,
``tests/unit_tests/initialisation/test_aerosol_composition.py``)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Box, Parcel
from pysdm_tpu.dynamics import AmbientThermodynamics, Condensation, Freezing
from pysdm_tpu import products as prod
from pysdm_tpu.initialisation import DryAerosolMixture, spectra
from pysdm_tpu.initialisation.sampling.spectral_sampling import (
    ConstantMultiplicity,
)
from pysdm_tpu.physics import si


class TestSurfaceTension:
    T = 283.0
    v_wet = 4.0 / 3 * np.pi * (1e-6) ** 3
    v_dry = 4.0 / 3 * np.pi * (1e-7) ** 3

    def test_ovadnevaite_matches_closed_form(self):
        sgm_org, delta_min = 0.04, 1e-9
        f = Formulae(
            surface_tension="CompressedFilmOvadnevaite",
            constants=dict(sgm_org=sgm_org, delta_min=delta_min),
        )
        f_org = 0.5
        got = float(
            f.surface_tension.sigma(self.T, self.v_wet, self.v_dry, f_org)
        )
        r_wet = (3 * self.v_wet / (4 * np.pi)) ** (1 / 3)
        v_delta = self.v_wet - 4 * np.pi / 3 * (r_wet - delta_min) ** 3
        c_beta = min(f_org * self.v_dry / v_delta, 1.0)
        sgm_w = f.constants.sgm_w
        expected = (1 - c_beta) * sgm_w + c_beta * sgm_org
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_ovadnevaite_limits(self):
        f = Formulae(
            surface_tension="CompressedFilmOvadnevaite",
            constants=dict(sgm_org=0.04, delta_min=1e-9),
        )
        sgm_w = f.constants.sgm_w
        # no organic -> pure water
        assert float(
            f.surface_tension.sigma(self.T, self.v_wet, self.v_dry, 0.0)
        ) == pytest.approx(sgm_w)
        # thick organic coverage -> organic surface tension
        v_dry_big = 0.9 * self.v_wet
        assert float(
            f.surface_tension.sigma(self.T, self.v_wet, v_dry_big, 1.0)
        ) == pytest.approx(0.04)

    # realistic constants (reference
    # ``tests/unit_tests/initialisation/test_equilibrate_wet_radii.py:30-33``)
    RUEHL = dict(
        RUEHL_nu_org=7.47e-5,  # m^3/mol
        RUEHL_A0=2.5e-19,  # m^2
        RUEHL_C0=1e-5,
        RUEHL_m_sigma=0.3e17,  # J/m^2 per m^2
        RUEHL_sgm_min=0.02,
    )

    def test_ruehl_bisection_matches_brute_force_root(self):
        f = Formulae(surface_tension="CompressedFilmRuehl", constants=self.RUEHL)
        c = f.constants
        f_org = 0.8
        v_wet = 4 / 3 * np.pi * (0.2e-6) ** 3
        v_dry = 4 / 3 * np.pi * (0.1e-6) ** 3
        got = float(f.surface_tension.sigma(self.T, v_wet, v_dry, f_org))
        assert c.RUEHL_sgm_min <= got <= c.sgm_w
        # brute-force the isotherm root and map to sigma
        Cb_iso = (f_org * v_dry / c.RUEHL_nu_org) / (
            v_wet / c.water_molar_volume
        )
        r_wet = (3 * v_wet / (4 * np.pi)) ** (1 / 3)
        A_iso = (4 * np.pi * r_wet**2) / (
            f_org * v_dry * c.N_A / c.RUEHL_nu_org
        )
        cc = (c.RUEHL_m_sigma * c.N_A) / (2 * c.R_str * self.T)

        def minfun(fs):
            return Cb_iso * (1 - fs) / c.RUEHL_C0 - np.exp(
                cc * (c.RUEHL_A0**2 - (A_iso / fs) ** 2)
            )

        fss = np.linspace(1e-6, 1.0, 200001)
        vals = minfun(fss)
        cross = np.where(np.diff(np.sign(vals)))[0][0]
        f_surf = fss[cross]
        expected = c.sgm_w - (c.RUEHL_A0 - A_iso / f_surf) * c.RUEHL_m_sigma
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_szyszkowski_monotone_in_f_org(self):
        f = Formulae(surface_tension="SzyszkowskiLangmuir", constants=self.RUEHL)
        sigmas = [
            float(f.surface_tension.sigma(self.T, self.v_wet, self.v_dry, fo))
            for fo in (0.0, 0.25, 0.5, 1.0)
        ]
        assert sigmas[0] == pytest.approx(f.constants.sgm_w)
        assert all(a >= b for a, b in zip(sigmas, sigmas[1:]))


class TestDryAerosolMixture:
    def make_mixture(self):
        return DryAerosolMixture(
            compounds=("(NH4)2SO4", "insoluble"),
            densities={"(NH4)2SO4": 1770 * si.kg / si.m**3,
                       "insoluble": 1320 * si.kg / si.m**3},
            molar_masses={"(NH4)2SO4": 132.14e-3 * si.kg / si.mole,
                          "insoluble": 0.1 * si.kg / si.mole},
            is_soluble={"(NH4)2SO4": True, "insoluble": False},
            # the organic dissociates in the bulk-solubility (Constant) view
            # but partitions to the surface in the film models (phi matters
            # only for the former) — as in the reference Lowe-2019 aerosols
            ionic_dissociation_phi={"(NH4)2SO4": 3, "insoluble": 1},
        )

    def test_volume_fractions_sum_to_one(self):
        mix = self.make_mixture()
        vf = mix.volume_fractions({"(NH4)2SO4": 0.7, "insoluble": 0.3})
        assert sum(vf.values()) == pytest.approx(1.0)

    def test_kappa_pure_ammonium_sulfate(self):
        mix = self.make_mixture()
        f = Formulae()
        kappas = mix.kappa(
            {"(NH4)2SO4": 1.0, "insoluble": 0.0},
            water_molar_volume=f.constants.water_molar_volume,
        )
        # kappa of pure ammonium sulfate ~ 0.72 (Petters & Kreidenweis 2007)
        assert 0.6 < kappas["Constant"] < 0.8
        assert kappas["CompressedFilmOvadnevaite"] == pytest.approx(
            kappas["Constant"]
        )

    def test_insoluble_fraction_reduces_kappa(self):
        mix = self.make_mixture()
        f = Formulae()
        wmv = f.constants.water_molar_volume
        k_pure = mix.kappa({"(NH4)2SO4": 1.0, "insoluble": 0.0}, wmv)
        k_half = mix.kappa({"(NH4)2SO4": 0.5, "insoluble": 0.5}, wmv)
        assert k_half["Constant"] < k_pure["Constant"]
        # film models count only the soluble fraction
        assert k_half["CompressedFilmRuehl"] < k_half["Constant"]
        assert mix.nu_org({"(NH4)2SO4": 0.5, "insoluble": 0.5}) == pytest.approx(
            0.1 / 1320
        )


def test_freezing_products():
    n_sd = 256
    formulae = Formulae(
        seed=7,
        particle_shape_and_density="MixedPhaseSpheres",
        freezing_temperature_spectrum="Niemand_et_al_2012",
        constants={"NIEMAND_A": -0.517, "NIEMAND_B": 8.934},
    )
    env = Box(dt=1.0, dv=1 * si.m**3)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    env["T"] = np.asarray([250.0])
    env["RH"] = np.asarray([1.05])
    env["rhod"] = np.asarray([1.1])
    builder.add_dynamic(Freezing(singular=True))
    rng = np.random.default_rng(7)
    attributes = {
        "multiplicity": np.full(n_sd, 1e6),
        "water mass": np.full(n_sd, 1e-12),
        "freezing temperature": rng.uniform(230.0, 260.0, n_sd),
    }
    particulator = builder.build(
        attributes,
        products=(
            prod.IceWaterContent(),
            prod.SpecificIceWaterContent(),
            prod.FrozenParticleConcentration(),
            prod.FrozenParticleSpecificConcentration(),
            prod.FrozenFraction(),
            prod.IceNucleiConcentration(),
            prod.SpecificIceNucleiConcentration(),
            prod.FreezableSpecificConcentration(
                temperature_bins_edges=np.linspace(230, 260, 7)
            ),
            prod.CoolingRate(),
        ),
    )
    particulator.run(1)
    frozen_frac = particulator.products["frozen fraction"].get()
    expected = np.mean(
        np.asarray(particulator.attributes["freezing temperature"]) >= 250.0
    )
    np.testing.assert_allclose(frozen_frac, expected, rtol=1e-6)
    inc = particulator.products["ice nuclei concentration"].get()
    np.testing.assert_allclose(inc, n_sd * 1e6, rtol=1e-6)
    sinc = particulator.products["specific ice nuclei concentration"].get()
    np.testing.assert_allclose(sinc, n_sd * 1e6 / 1.1, rtol=1e-6)
    fsc = particulator.products["freezable specific concentration"].get()
    assert fsc.shape[-1] == 6
    # integral of the binned spectrum recovers total number / rhod
    total = np.sum(fsc * np.diff(np.linspace(230, 260, 7))) * 1.1
    np.testing.assert_allclose(total, n_sd * 1e6, rtol=1e-6)
    iwc = np.asarray(particulator.products["ice water content"].get()).item()
    assert iwc == pytest.approx(expected * n_sd * 1e6 * 1e-12, rel=1e-5)


def test_optical_and_parcel_products():
    n_sd = 128
    formulae = Formulae(
        seed=5, optical_albedo="Bohren1987", optical_depth="Stephens1978"
    )
    env = Parcel(
        dt=1 * si.s,
        mass_of_dry_air=1e3 * si.kg,
        p0=1000 * si.hPa,
        initial_water_vapour_mixing_ratio=0.02,
        T0=295 * si.K,
        w=1.0 * si.m / si.s,
    )
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation())
    r_dry, n_in_dv = ConstantMultiplicity(
        spectra.Lognormal(norm_factor=1e11, m_mode=50 * si.nm, s_geom=1.5)
    ).sample(n_sd)
    attributes = env.init_attributes(n_in_dv=n_in_dv, kappa=0.6, r_dry=r_dry)
    particulator = builder.build(
        attributes,
        products=(
            prod.ParcelDisplacement(),
            prod.ParcelLiquidWaterPath(
                count_activated=True, count_unactivated=False
            ),
            prod.CloudAlbedo(),
            prod.CloudOpticalDepth(),
            prod.EffectiveRadius(),
        ),
    )
    for _ in range(5):
        particulator.run(1)
    z = particulator.products["parcel displacement"].get()
    assert 4.0 < np.asarray(z).item() <= 5.5
    lwp = particulator.products["parcel liquid water path"].get()
    assert np.all(np.asarray(lwp) >= 0)
    tau = particulator.products["cloud optical depth"].get(
        liquid_water_path=0.1, effective_radius=10e-6
    )
    assert float(np.asarray(tau)) == pytest.approx(
        1.5 * 0.1 / (formulae.constants.rho_w * 10e-6)
    )
    albedo = particulator.products["cloud albedo"].get(
        optical_depth=float(np.asarray(tau))
    )
    assert 0 < float(np.asarray(albedo)) < 1


def test_chemistry_spectrum_products():
    n_sd = 64
    formulae = Formulae(seed=3)
    env = Box(dt=1.0, dv=1 * si.m**3)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae), environment=env)
    env["T"] = np.asarray([290.0])
    env["rhod"] = np.asarray([1.2])
    rng = np.random.default_rng(3)
    r_dry = rng.uniform(0.05e-6, 1e-6, n_sd)
    v_dry = 4 / 3 * np.pi * r_dry**3
    attributes = {
        "multiplicity": np.full(n_sd, 1e3),
        "water mass": np.full(n_sd, 1e-12),
        "dry volume": v_dry,
        "kappa times dry volume": 0.6 * v_dry,
        "moles_S_VI": np.full(n_sd, 1e-16),
    }
    particulator = builder.build(
        attributes,
        products=(
            prod.TotalDryMassMixingRatio(density=1770.0),
            prod.AqueousMassSpectrum(
                key="S_VI", dry_radius_bins_edges=np.logspace(-8, -5, 7)
            ),
            prod.SpecificAqueousMassSpectrum(
                key="S_VI", dry_radius_bins_edges=np.logspace(-8, -5, 7)
            ),
        ),
    )
    dmr = np.asarray(particulator.products["total dry mass mixing ratio"].get()).item()
    expected = 1770.0 * np.sum(1e3 * v_dry) / 1.2
    np.testing.assert_allclose(dmr, expected, rtol=1e-5)
    spec = particulator.products["aqueous S_VI mass spectrum"].get()
    assert spec.shape[-1] == 6 and np.all(spec >= 0) and spec.sum() > 0


class TestRateCounterPrecisionGuard:
    """f32 rate-accumulation precision sentinel (``rate_step_sum_max``):
    when a single step's per-cell event sum exceeds 2^24 the rate products
    warn about the ~1e-7 relative accumulation error (the reference
    accumulates exactly via i64 atomics, ``collisions_methods.py:523-560``)"""

    @staticmethod
    def _run_box(multiplicity_scale):
        import warnings as w

        from pysdm_tpu.dynamics import Coalescence
        from pysdm_tpu.dynamics.collisions.collision_kernels import Golovin

        f = Formulae(seed=44)
        env = Box(dv=1e6 * si.m**3, dt=1.0 * si.s)
        n_sd = 64
        builder = Builder(n_sd=n_sd, backend=CPU(f), environment=env)
        builder.add_dynamic(
            Coalescence(collision_kernel=Golovin(b=1.5e3), adaptive=False)
        )
        rate_product = prod.CollisionRatePerGridbox()
        x0 = float(f.trivia.volume(radius=30.531 * si.um))
        rng = np.random.default_rng(44)
        attributes = {
            "volume": x0 * (1 + rng.random(n_sd)),
            "multiplicity": np.full(n_sd, multiplicity_scale),
        }
        particulator = builder.build(attributes, products=(rate_product,))
        particulator.run(2)
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            rate_product.get()
        return [str(c.message) for c in caught]

    def test_warns_past_f32_exact_range(self):
        messages = self._run_box(multiplicity_scale=1e12)
        assert any("2^24" in m for m in messages)

    def test_silent_in_exact_range(self):
        messages = self._run_box(multiplicity_scale=1e3)
        assert not any("2^24" in m for m in messages)
