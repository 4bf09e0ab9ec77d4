"""Srivastava 1982 box coalescence+breakup vs the paper's analytic eq. 13
(mirrors reference ``tests/smoke_tests/box/srivastava_1982/test_eq_13.py``)."""

import numpy as np

from pysdm_tpu.models.srivastava_1982 import (
    Equations,
    Settings,
    coalescence_and_breakup_eq13,
)
from pysdm_tpu.physics import si


def test_equations_limits():
    eq = Equations(M=4e6, c=0.5e-6, beta=1e-9)
    # eq. 13 starts at m0 and relaxes monotonically to the eq. 14 equilibrium
    tau = eq.tau(np.linspace(0, 1e4, 64))
    m = eq.eq13(1.0, tau)
    assert abs(m[0] - 1.0) < 1e-12
    assert (np.diff(m) >= 0).all()
    assert m[-1] <= eq.eq14()
    assert abs(m[-1] - eq.eq14()) / eq.eq14() < 1e-6


def test_merge_and_break_close_to_analytic():
    settings = Settings(
        srivastava_c=0.5e-6 / si.s,
        srivastava_beta=1e-9 / si.s,
        frag_mass=0.25 * si.g,
        n_sds=(2**10,),
        drop_mass_0=1 * si.g,
        dt=1 * si.s,
        dv=1 * si.m**3,
        total_number=1e6,
    )
    n_steps = 128
    results = coalescence_and_breakup_eq13(
        settings=settings, n_steps=n_steps, seed=44
    )
    sim = results["pysdm"][2**10]["mean mass to frag mass"]
    ana = results["analytic_mean_mass_to_frag_mass"]
    # growth happened and tracks the analytic curve within Monte-Carlo noise
    assert sim[-1] > 2 * sim[0]
    rel_err = np.abs(sim[1:] - ana[1:]) / ana[1:]
    assert rel_err.mean() < 0.15
    assert rel_err[-16:].mean() < 0.2
