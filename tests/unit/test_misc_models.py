"""Smoke coverage for the remaining app-layer modules: the Bartman et al.
2021 benchmark harness (reference ``Bartman_et_al_2021/demo_fig2.ipynb``)
and the IsotopicFractionation dynamic's wiring contract (reference
``dynamics/isotopic_fractionation.py`` — its compute body is a stub in the
reference too, ``isotope_methods.py:28``)."""

import numpy as np
import pytest

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.dynamics import (
    AmbientThermodynamics,
    Condensation,
    IsotopicFractionation,
)
from pysdm_tpu.environments import Parcel
from pysdm_tpu.models.bartman_et_al_2021 import benchmark


def test_bartman_benchmark_harness_returns_timings():
    results = benchmark(
        backend_classes=(CPU,),
        n_sd_per_gridbox_list=(2,),
        grid=(4, 4),
        n_steps=2,
    )
    assert set(results) == {"CPU"}
    assert set(results["CPU"]) == {2}
    assert results["CPU"][2] > 0


class TestIsotopicFractionation:
    @staticmethod
    def _builder():
        env = Parcel(
            dt=1.0, mass_of_dry_air=1e3, p0=1000e2,
            initial_water_vapour_mixing_ratio=0.015, T0=295.0, w=1.0,
        )
        return Builder(n_sd=8, backend=CPU(Formulae(seed=4)), environment=env), env

    def test_requires_condensation_before_it(self):
        builder, _ = self._builder()
        builder.add_dynamic(IsotopicFractionation(isotopes=("18O",)))
        with pytest.raises(AssertionError, match="Condensation"):
            builder.build(
                {"multiplicity": np.ones(8), "water mass": np.full(8, 1e-12)}
            )

    def test_registers_isotope_attributes_and_steps(self):
        builder, env = self._builder()
        builder.add_dynamic(AmbientThermodynamics())
        builder.add_dynamic(Condensation(adaptive=False))
        builder.add_dynamic(IsotopicFractionation(isotopes=("18O",)))
        r_dry = np.full(8, 50e-9)
        attributes = env.init_attributes(
            n_in_dv=np.full(8, 1e6), kappa=0.5, r_dry=r_dry
        )
        attributes["moles_18O"] = np.full(8, 1e-18)
        particulator = builder.build(attributes)
        particulator.run(2)
        # stub dynamic: isotope amounts pass through unchanged
        np.testing.assert_array_equal(
            np.asarray(particulator.get_attribute("moles_18O")),
            np.full(8, 1e-18),
        )


def test_profile_run_reports_per_dynamic_times(tmp_path):
    from pysdm_tpu.utils.profiling import profile_run

    env = Parcel(
        dt=1.0, mass_of_dry_air=1e3, p0=1000e2,
        initial_water_vapour_mixing_ratio=0.015, T0=295.0, w=1.0,
    )
    builder = Builder(n_sd=8, backend=CPU(Formulae(seed=4)), environment=env)
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(Condensation(adaptive=False))
    attributes = env.init_attributes(
        n_in_dv=np.full(8, 1e6), kappa=0.5, r_dry=np.full(8, 50e-9)
    )
    particulator = builder.build(attributes)
    times = profile_run(particulator, 3, logdir=tmp_path)
    assert set(times) >= {"AmbientThermodynamics", "Condensation"}
    assert all(v > 0 for v in times.values())
    assert particulator.n_steps == 3
    assert any(tmp_path.iterdir())  # a trace was captured
