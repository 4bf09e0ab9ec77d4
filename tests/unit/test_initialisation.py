"""Initialisation-layer unit tests (reference analogues:
``tests/unit_tests/initialisation/test_spectral_discretisation.py``,
``test_discretise_multiplicities.py``, ``test_equilibrate_wet_radii.py``,
``test_init_fall_momenta.py``, ``test_spatial_discretisation.py``,
``test_spectra_lognormal.py``)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Box
from pysdm_tpu.initialisation import spectra
from pysdm_tpu.initialisation.discretise_multiplicities import (
    discretise_multiplicities,
)
from pysdm_tpu.initialisation.equilibrate_wet_radii import equilibrate_wet_radii
from pysdm_tpu.initialisation.init_fall_momenta import init_fall_momenta
from pysdm_tpu.initialisation.sampling import spectral_sampling
from pysdm_tpu.initialisation.sampling.spatial_sampling import Pseudorandom
from pysdm_tpu.physics import si

M_MODE = 0.5e-5
N_PART = 256 * 16
S_GEOM = 1.5
N_SD = 256


@pytest.mark.parametrize(
    "discretisation",
    (
        spectral_sampling.Linear,
        spectral_sampling.Logarithmic,
        spectral_sampling.ConstantMultiplicity,
        spectral_sampling.UniformRandom,
    ),
)
def test_spectral_discretisation_recovers_totals(discretisation):
    # mirrors the reference's test: sampled multiplicities recover the
    # spectrum's total number within the 1% deterministic error guard
    spectrum = spectra.Lognormal(
        norm_factor=N_PART, m_mode=M_MODE, s_geom=S_GEOM
    )
    m, n = discretisation(spectrum).sample(
        N_SD, **({"seed": 44} if discretisation is spectral_sampling.UniformRandom else {})
    )
    assert m.shape == n.shape == (N_SD,)
    assert (m > 0).all() and (n >= 0).all()
    # UniformRandom is a Monte-Carlo estimate of the number integral — only
    # statistically convergent (the deterministic guard doesn't apply)
    rtol = 0.25 if discretisation is spectral_sampling.UniformRandom else 0.01
    np.testing.assert_allclose(n.sum(), N_PART, rtol=rtol)
    # ConstantMultiplicity: all multiplicities (near-)equal
    if discretisation is spectral_sampling.ConstantMultiplicity:
        np.testing.assert_allclose(n, n[0], rtol=1e-6)


def test_spectral_sampling_error_guard_raises():
    # an aggressively truncated size range loses >1% of the number — the
    # deterministic samplings must raise (reference
    # ``spectral_sampling.py:48-60``)
    spectrum = spectra.Lognormal(norm_factor=1.0, m_mode=M_MODE, s_geom=S_GEOM)
    sampling = spectral_sampling.Linear(
        spectrum, size_range=(M_MODE, 2 * M_MODE)
    )
    with pytest.raises(ValueError, match="error in total real-droplet number"):
        sampling.sample(64)


class TestDiscretiseMultiplicities:
    @staticmethod
    def test_nan_flags_zero():
        vals = np.asarray([np.nan, 1e6, np.nan])
        out = discretise_multiplicities(vals)
        assert out.dtype == np.int64
        np.testing.assert_array_equal(out, [0, 10**6, 0])

    @staticmethod
    def test_zero_multiplicity_raises():
        with pytest.raises(ValueError, match="multiplicity of zero"):
            discretise_multiplicities(np.asarray([0.4, 1e6]))

    @staticmethod
    def test_total_number_error_guard():
        # each 0.6 rounds to 1 (+67% each) -> guard trips
        with pytest.raises(ValueError, match="error in total real-droplet"):
            discretise_multiplicities(np.full(10, 0.6))


def test_equilibrate_wet_radii_matches_koehler_equilibrium():
    formulae = Formulae(seed=1)
    env = Box(dt=1.0, dv=1 * si.m**3)
    builder = Builder(n_sd=8, backend=CPU(formulae), environment=env)
    env["T"] = np.asarray([285.0])
    env["RH"] = np.asarray([0.9])
    particulator = builder.build(
        attributes={
            "multiplicity": np.ones(8),
            "water mass": np.full(8, 1e-15),
        },
    )
    r_dry = np.geomspace(10e-9, 200e-9, 8)
    kappa = 0.6
    ktdv = kappa * np.asarray(formulae.trivia.volume(radius=r_dry))
    r_wet = equilibrate_wet_radii(
        r_dry=r_dry, environment=env, kappa_times_dry_volume=ktdv
    )
    assert (r_wet >= r_dry).all()
    # wet radii satisfy RH == RH_eq(r) at the ambient T (Koehler equilibrium)
    rd3 = r_dry**3
    sgm = formulae.constants.sgm_w
    rh_eq = np.asarray(
        formulae.hygroscopicity.RH_eq(r_wet, 285.0, kappa, rd3, sgm)
    )
    np.testing.assert_allclose(rh_eq, 0.9, rtol=1e-4)
    # monotonicity: larger dry radius -> larger equilibrium wet radius
    assert (np.diff(r_wet) > 0).all()


def test_init_fall_momenta():
    formulae = Formulae(seed=1)
    radii = np.asarray([30e-6, 300e-6, 1e-3])
    mass = np.asarray(
        formulae.particle_shape_and_density.volume_to_mass(
            formulae.trivia.volume(radius=radii)
        )
    )
    p = init_fall_momenta(mass, formulae)
    assert p.shape == mass.shape
    v = p / mass
    # Gunn-Kinzer terminal velocities: increasing, and in the right ballpark
    assert (np.diff(v) > 0).all()
    assert 0.05 < v[0] < 0.5  # 30 um drizzle ~0.1 m/s
    assert 2.0 < v[1] < 4.0  # 300 um drop ~2.5 m/s
    assert 5.0 < v[2] < 10.0  # 1 mm raindrop ~6.5 m/s
    np.testing.assert_array_equal(
        init_fall_momenta(mass, formulae, zero=True), np.zeros_like(mass)
    )


class TestSpatialSampling:
    @staticmethod
    def test_pseudorandom_in_bounds():
        grid = (25, 40)
        pos = Pseudorandom.sample(grid=grid, n_sd=10_000, seed=44)
        assert pos.shape == (2, 10_000)
        for d in range(2):
            assert (pos[d] >= 0).all() and (pos[d] < grid[d]).all()
            # roughly uniform: mean near the middle of the range
            np.testing.assert_allclose(pos[d].mean(), grid[d] / 2, rtol=0.05)

    @staticmethod
    def test_z_part_confinement():
        grid = (10, 64)
        z_part = (0.25, 0.75)
        pos = Pseudorandom.sample(grid=grid, n_sd=1000, z_part=z_part, seed=44)
        assert (pos[1] >= z_part[0] * grid[1]).all()
        assert (pos[1] <= z_part[1] * grid[1]).all()
