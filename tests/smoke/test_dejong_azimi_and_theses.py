"""Smoke tests for the deJong & Azimi moment-comparison setups and the
Bartman-2020 / Bulenok-2023 thesis benchmark harnesses."""

import numpy as np

from pysdm_tpu.models import dejong_azimi, thesis_benchmarks
from pysdm_tpu.physics import si


def test_dejong_azimi_box_moments():
    settings = dejong_azimi.Settings0D(n_sd=2**12)
    out = dejong_azimi.run_box(settings)
    m0, m1 = out.moments[:, 0], out.moments[:, 1]
    # coalescence: number decreases, volume conserved, mean volume grows
    assert m0[0] > m0[-1]
    np.testing.assert_allclose(m1, m1[0], rtol=1e-6)
    assert (np.diff(m1 / m0) > 0).all()
    assert out.dv_dlnr.shape == (3, 63)
    # parity with the Cloudy.jl MOM comparison data (reference
    # ``deJong_Azimi/cloudy_data_0d.py`` analytic Golovin M0 at t=0/60/120 s,
    # in 1/m^3 for the 100/cm^3 Gamma spectrum):
    analytic_m0 = np.array([100.0, 4.863406413211965, 0.23652721940076313])
    analytic_m0 *= 1e6  # 1/cm^3 -> 1/m^3
    np.testing.assert_allclose(m0[0], analytic_m0[0], rtol=0.02)
    np.testing.assert_allclose(m0[1:], analytic_m0[1:], rtol=0.5)


def test_dejong_azimi_settings_1d():
    settings = dejong_azimi.Settings1D(n_sd_per_gridbox=16, z_max=500 * si.m)
    assert settings.collision_kernel.b == 5e3
    assert settings.enable_condensation is False
    assert settings.z_part == (0.5, 0.75)
    # nz includes the below-surface particle reservoir (the reference
    # deJong_Azimi settings1D inherits it from the Shipway-Hill settings)
    assert settings.nz == 20 + int(
        settings.particle_reservoir_depth // settings.dz
    )


def test_bartman_2020_adaptive_recovers_small_dt():
    out = thesis_benchmarks.bartman_2020_fig_4(
        n_sds=(2**12,), dts=(1 * si.s, 10 * si.s, "adaptive")
    )
    (state_dt1, _) = out[(2**12, 1 * si.s)]
    (state_dt10, _) = out[(2**12, 10 * si.s)]
    (state_ad, _) = out[(2**12, "adaptive")]
    # state dicts are keyed by step index (= time / dt)
    ref = state_dt1[max(state_dt1.keys())]  # t=3600 s at dt=1
    last10 = max(state_dt10.keys())  # t=3600 s at dt=10
    # adaptive run at nominal dt=10 stays closer to the dt=1 reference
    # spectrum than the fixed dt=10 run
    err_ad = np.abs(state_ad[last10] - ref).sum()
    err_fixed = np.abs(state_dt10[last10] - ref).sum()
    assert err_ad <= err_fixed * 1.25  # adaptive never much worse


def test_bulenok_2023_benchmark():
    res = thesis_benchmarks.bulenok_2023_benchmark(
        n_sds=(2**10,), n_steps=32
    )
    r = res[2**10]
    assert r["pair_updates_per_s"] > 0
    assert r["mean_mass_final"] > 1.0
