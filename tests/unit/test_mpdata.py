"""MPDATA advector validation against analytic properties: exact-shift limit,
conservation (incl. non-unit G), accuracy ordering upwind < MPDATA,
FCT monotonicity, constant-field preservation under divergence-free advectors,
and 2D solid-body rotation (the standard MPDATA test case)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysdm_tpu.ops.mpdata import mpdata_step


def advance(psi, gc, g=None, steps=1, **opts):
    step = jax.jit(
        lambda p: mpdata_step(p, gc, g, **opts), static_argnames=()
    )
    for _ in range(steps):
        psi = step(psi)
    return psi


def test_courant_one_exact_shift():
    psi = jnp.asarray(np.random.default_rng(0).uniform(0, 1, 32))
    gc = (jnp.ones(33),)
    out = advance(psi, gc, n_iters=1)
    np.testing.assert_allclose(np.asarray(out), np.roll(np.asarray(psi), 1), atol=1e-14)


@pytest.mark.parametrize("n_iters", (1, 2, 3))
@pytest.mark.parametrize("iga,fct", ((False, False), (True, False), (True, True), (False, True)))
def test_conservation_periodic(n_iters, iga, fct):
    rng = np.random.default_rng(1)
    psi = jnp.asarray(rng.uniform(0.1, 1, (16, 24)))
    gc = (
        jnp.asarray(rng.uniform(-0.4, 0.4, (17, 24))),
        jnp.asarray(rng.uniform(-0.4, 0.4, (16, 25))),
    )
    # periodic advector: wrap faces must coincide
    gc = (
        gc[0].at[-1].set(gc[0][0]),
        gc[1].at[:, -1].set(gc[1][:, 0]),
    )
    out = advance(
        psi, gc, steps=5, n_iters=n_iters, infinite_gauge=iga, nonoscillatory=fct
    )
    np.testing.assert_allclose(float(jnp.sum(out)), float(jnp.sum(psi)), rtol=1e-12)


def test_mpdata_beats_upwind_on_smooth_profile():
    n = 64
    x = (np.arange(n) + 0.5) / n
    psi0 = jnp.asarray(2 + np.sin(2 * np.pi * x))
    c = 0.25
    steps = int(n / c)  # one full revolution
    gc = (jnp.full(n + 1, c),)
    err = {}
    for n_iters in (1, 2, 3):
        out = advance(psi0, gc, steps=steps, n_iters=n_iters)
        err[n_iters] = float(jnp.max(jnp.abs(out - psi0)))
    assert err[2] < 0.35 * err[1]
    assert err[3] < 0.8 * err[2]


@pytest.mark.parametrize("iga", (False, True))
def test_fct_monotonicity_on_step(iga):
    n = 64
    psi0 = jnp.asarray(np.where((np.arange(n) > 10) & (np.arange(n) < 30), 1.0, 0.0))
    gc = (jnp.full(n + 1, 0.4),)
    out = advance(
        psi0, gc, steps=100, n_iters=2, infinite_gauge=iga, nonoscillatory=True
    )
    out = np.asarray(out)
    assert out.min() >= -1e-10, f"undershoot: {out.min()}"
    assert out.max() <= 1.0 + 1e-10, f"overshoot: {out.max()}"
    np.testing.assert_allclose(out.sum(), float(jnp.sum(psi0)), rtol=1e-12)


def test_constant_field_fixed_point_nonunit_g():
    """divergence-free G*u + constant psi -> psi stays constant (the moral
    equivalent of the reference's stream-function-driven kinematic setup)"""
    rng = np.random.default_rng(3)
    nx, nz = 12, 10
    # stream function on cell corners -> exactly divergence-free face fluxes
    stream = rng.uniform(-0.2, 0.2, (nx + 1, nz + 1))
    # periodic in x: wrap columns
    stream[-1, :] = stream[0, :]
    gc_x = stream[:, 1:] - stream[:, :-1]  # (nx+1, nz)
    gc_z = -(stream[1:, :] - stream[:-1, :])  # (nx, nz+1)
    g = jnp.asarray(1.0 + rng.uniform(0, 1, (nx, nz)))
    # g-weighted: advector is G*C; div(GC)=0 still required for the fixed point
    psi = jnp.full((nx, nz), 0.7)
    out = advance(
        psi,
        (jnp.asarray(gc_x), jnp.asarray(gc_z)),
        g,
        steps=10,
        n_iters=2,
        infinite_gauge=True,
        nonoscillatory=True,
        bcs=("periodic", "periodic"),
    )
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-12)


def test_solid_body_rotation_2d():
    """Gaussian blob, one full rotation on a periodic domain: mass conserved,
    peak preserved within tolerance, shape correlation high"""
    n = 48
    xs = (np.arange(n) + 0.5) / n - 0.5
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    psi0 = np.exp(-((X + 0.25) ** 2 + Z**2) / (2 * 0.07**2))
    omega = 2 * np.pi
    dt = 0.12 / n  # keep |C_x|+|C_z| < 1 at the domain corners
    # velocities at faces (solid body: u=-omega*z, w=omega*x)
    xf = np.arange(n + 1) / n - 0.5
    Xf, Zc = np.meshgrid(xf, xs, indexing="ij")
    Xc, Zf = np.meshgrid(xs, xf, indexing="ij")
    gc_x = jnp.asarray(-omega * Zc * dt * n)
    gc_z = jnp.asarray(omega * Xc * dt * n)
    steps = int(round(1.0 / dt))
    out = advance(
        jnp.asarray(psi0),
        (gc_x, gc_z),
        steps=steps,
        n_iters=2,
        infinite_gauge=True,
        nonoscillatory=True,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out.sum(), psi0.sum(), rtol=1e-10)
    corr = np.corrcoef(out.ravel(), psi0.ravel())[0, 1]
    assert corr > 0.97, f"rotation correlation {corr}"
    assert out.max() > 0.7 * psi0.max()


class TestThirdOrderTerms:
    """SM98 eq. 36 third-order corrections (the reference's examples pass
    ``third_order_terms=...`` to PyMPDATA, ``mpdata_2d.py:45-50``): with
    infinite-gauge + TOT the linear scheme is third-order accurate."""

    @staticmethod
    def _order_1d(tot, C=0.4):
        errs = []
        for n in (32, 64, 128):
            x = (np.arange(n) + 0.5) / n
            psi0 = np.sin(2 * np.pi * x) + 2.0
            gc = (jnp.full(n + 1, C),)
            psi = jnp.asarray(psi0)
            for _ in range(int(round(n / C))):  # one full revolution
                psi = mpdata_step(
                    psi, gc, n_iters=2, infinite_gauge=True,
                    third_order_terms=tot,
                )
            errs.append(float(np.abs(np.asarray(psi) - psi0).max()))
        return [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]

    def test_1d_third_order_convergence(self):
        orders_2nd = self._order_1d(tot=False)
        orders_3rd = self._order_1d(tot=True)
        assert all(1.8 < o < 2.4 for o in orders_2nd), orders_2nd
        assert all(o > 2.8 for o in orders_3rd), orders_3rd

    @staticmethod
    def test_2d_cross_terms_reach_third_order():
        def err(tot, n, Cx=0.3, Cy=0.2):
            x = (np.arange(n) + 0.5) / n
            X, Y = np.meshgrid(x, x, indexing="ij")
            psi0 = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y) + 2.0
            gcs = (jnp.full((n + 1, n), Cx), jnp.full((n, n + 1), Cy))
            psi = jnp.asarray(psi0)
            for _ in range(10 * n):  # Cx: 3 revolutions, Cy: 2 -> periodic
                psi = mpdata_step(
                    psi, gcs, n_iters=2, infinite_gauge=True,
                    third_order_terms=tot,
                )
            return float(np.abs(np.asarray(psi) - psi0).max())

        errs = [err(True, n) for n in (16, 32, 64)]
        orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
        assert orders[-1] > 2.8, (errs, orders)
        # strictly better than the second-order scheme
        assert errs[-1] < err(False, 64)

    @staticmethod
    def test_option_accepted_by_solvers():
        from pysdm_tpu.dynamics.eulerian_advection import MPDATA_1D, MPDATA_2D

        MPDATA_1D(
            nz=8, dt=1.0, advector_of_t=lambda t: jnp.zeros(9),
            g_factor_z=np.ones(8), g_factor_z_faces=np.ones(9),
            third_order_terms=True,
        )
        MPDATA_2D(
            advectees={"th": np.zeros((4, 4))},
            stream_function=lambda xX, zZ, t: 0.0 * xX * zZ,
            rhod_of_zZ=lambda zZ: np.ones_like(np.asarray(zZ)),
            dt=1.0, grid=(4, 4), size=(100.0, 100.0),
            third_order_terms=True,
        )
