"""Long-tail derived attributes (reference parity):

- "cooling rate" + CoolingRate product
  (reference ``attributes/ice/cooling_rate.py``,
  ``products/freezing/cooling_rate.py``,
  ``tests/unit_tests/products/test_cooling_rate.py``)
- "temperature of last freezing"
  (reference ``attributes/ice/freezing_temperature.py``
  TemperatureOfLastFreezing + ``freezing_methods.py``
  record_freezing_temperatures)
- "moles light water" (reference ``attributes/isotopes/moles.py``)
- "pH" / "conc_H" resolver routing
  (reference ``attributes/chemistry/acidity.py``,
  ``hydrogen_ion_concentration.py``)
"""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.dynamics import Freezing
from pysdm_tpu.environments import Box
from pysdm_tpu.physics import si
from pysdm_tpu.products.freezing import CoolingRate

T0 = 300.0
N_SD = 64
DT = 44.0
D_T = -2.0


def _make_cooling_rate_particulator():
    env = Box(dt=DT, dv=1 * si.m**3)
    builder = Builder(n_sd=N_SD, backend=CPU(Formulae(seed=1)), environment=env)
    env["T"] = np.asarray([T0])
    particulator = builder.build(
        attributes={
            "multiplicity": np.ones(N_SD),
            "volume": np.linspace(0.01, 10, N_SD) * si.um**3,
        },
        products=(CoolingRate(),),
    )
    return particulator, env


class TestCoolingRate:
    @staticmethod
    def test_nan_at_t_zero():
        particulator, _ = _make_cooling_rate_particulator()
        cr = particulator.products["cooling rate"].get()
        assert np.isnan(cr).all()

    @staticmethod
    def test_zero_with_no_env_change():
        particulator, _ = _make_cooling_rate_particulator()
        particulator.run(1)
        cr = particulator.products["cooling rate"].get()
        np.testing.assert_allclose(cr, 0.0)

    @staticmethod
    def test_with_env_change():
        particulator, env = _make_cooling_rate_particulator()
        particulator.run(1)
        env["T"] = np.asarray([T0 + D_T])
        cr = particulator.products["cooling rate"].get()
        np.testing.assert_allclose(cr, -D_T / DT)


class TestTemperatureOfLastFreezing:
    @staticmethod
    def test_records_ambient_t_on_freeze_and_resets_on_thaw():
        t_ambient = 240.0
        formulae = Formulae(
            seed=7,
            particle_shape_and_density="MixedPhaseSpheres",
            heterogeneous_ice_nucleation_rate="Constant",
            constants={"J_HET": 1e12},  # 1/m^2/s — freeze ~immediately
        )
        env = Box(dt=1.0 * si.s, dv=1 * si.m**3)
        builder = Builder(n_sd=N_SD, backend=CPU(formulae), environment=env)
        env["T"] = np.asarray([t_ambient])
        env["RH"] = np.asarray([1.05])
        builder.add_dynamic(Freezing(singular=False))
        builder.request_attribute("temperature of last freezing")
        particulator = builder.build(
            attributes={
                "multiplicity": np.ones(N_SD),
                "water mass": np.full(N_SD, 1e-12),
                "immersed surface area": np.full(N_SD, 1e-8),
            },
        )
        tlf0 = np.asarray(
            particulator.get_attribute("temperature of last freezing")
        )
        assert np.isnan(tlf0).all()

        particulator.run(2)
        frozen = (
            np.asarray(particulator.get_attribute("signed water mass")) < 0
        )
        assert frozen.all()
        tlf = np.asarray(
            particulator.get_attribute("temperature of last freezing")
        )
        np.testing.assert_allclose(tlf, t_ambient)

        # warm above freezing with thaw enabled -> record resets to NaN
        particulator.dynamics["Freezing"].thaw = True
        env["T"] = np.asarray([280.0])
        # rebuild the step with thaw on (the reference's `thaw` is a
        # constructor flag too; here we just re-make the step fn)
        import jax

        particulator._step_fn = jax.jit(
            particulator.dynamics["Freezing"].make_step(particulator)
        )
        particulator.sim_state = particulator._step_fn(particulator.sim_state)
        tlf2 = np.asarray(
            particulator.get_attribute("temperature of last freezing")
        )
        assert np.isnan(tlf2).all()


class TestMolesLightWater:
    @staticmethod
    def test_backs_out_heavy_isotopologues():
        formulae = Formulae(seed=1)
        const = formulae.constants
        env = Box(dt=1.0, dv=1 * si.m**3)
        builder = Builder(n_sd=4, backend=CPU(formulae), environment=env)
        builder.request_attribute("moles light water")
        moles_18O = np.asarray([0.0, 1e-15, 2e-15, 3e-15])
        water_mass = np.full(4, 1e-9)
        particulator = builder.build(
            attributes={
                "multiplicity": np.ones(4),
                "water mass": water_mass,
                "moles_18O": moles_18O,
            },
        )
        got = np.asarray(particulator.get_attribute("moles light water"))
        M_H2O = 2 * const.M_1H + const.M_16O
        want = (
            water_mass - moles_18O * (2 * const.M_1H + const.M_18O)
        ) / M_H2O
        np.testing.assert_allclose(got, want, rtol=1e-12)
        # sanity: mass closes when recombining light + heavy isotopologues
        recombined = got * M_H2O + moles_18O * (2 * const.M_1H + const.M_18O)
        np.testing.assert_allclose(recombined, water_mass, rtol=1e-12)


class TestAcidityAttributes:
    @staticmethod
    def test_ph_and_conc_h():
        formulae = Formulae(seed=1)
        env = Box(dt=1.0, dv=1 * si.m**3)
        builder = Builder(n_sd=3, backend=CPU(formulae), environment=env)
        env["T"] = np.asarray([298.15])
        builder.request_attribute("pH")
        volume = np.full(3, 4.19e-15)  # ~10 um radius droplets, in m^3
        n_minus_iii = np.asarray([0.0, 1e-17, 1e-16])  # mol NH4 per droplet
        particulator = builder.build(
            attributes={
                "multiplicity": np.ones(3),
                "water mass": volume * 1e3,
                "moles_N_mIII": n_minus_iii,
                **{
                    f"moles_{k}": np.zeros(3)
                    for k in ("N_V", "C_IV", "S_IV", "S_VI", "O3", "H2O2")
                },
            },
        )
        pH = np.asarray(particulator.get_attribute("pH"))
        assert np.isfinite(pH).all()
        # pure water -> pH 7; ammonia shifts it basic, monotonically
        np.testing.assert_allclose(pH[0], 7.0, atol=0.05)
        assert pH[1] > pH[0] and pH[2] > pH[1]
        conc_H = np.asarray(particulator.get_attribute("conc_H"))
        np.testing.assert_allclose(
            conc_H,
            np.asarray(formulae.trivia.pH2H(pH)),
            rtol=1e-10,
        )
