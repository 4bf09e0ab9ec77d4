"""SciPy adaptive-timestep ODE condensation solver — drop-in replacement for
the implicit vectorized solver, FOR USE IN TESTS ONLY (cross-validation of
the bespoke solver; parity: reference
``PySDM/backends/impl_numba/test_helpers/scipy_ode_condensation_solver.py``).

``patch_particulator`` recomposes the particulator's step chain with the
Condensation stage replaced by a host-side ``scipy.integrate.solve_ivp`` of
the coupled (thd, x_1..x_n) system, where x is the diffusion coordinate of
droplet mass and the vapour mixing ratio is diagnosed from total-water
conservation (reference ``_odesys``, lines 169-225). Single-cell
environments only (parcel / box) — matching the reference helper's use."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import scipy.integrate

idx_thd = 0
idx_x = 1
rtol = 1e-6


def _make_host_step(particulator, condensation_dynamic):
    f = particulator.formulae
    const = f.constants
    dt = particulator.dt
    resolver = particulator._resolver

    def odesys(
        t, y, kappa, f_org, dry_volume, n, reynolds_number,
        dthd_dt, dqv_dt, drhod_dt, m_d, air_density, air_viscosity,
        rhod0, qt,
    ):
        thd = y[idx_thd]
        x = y[idx_x:]
        mass = np.asarray(f.diffusion_coordinate.mass(x))
        qv = qt + dqv_dt * t - np.sum(n * mass) / m_d
        rhod = rhod0 + drhod_dt * t
        T = float(f.state_variable_triplet.T(rhod, thd))
        p = float(f.state_variable_triplet.p(rhod, T, qv))
        pv = float(f.state_variable_triplet.pv(p, qv))
        pvs = float(f.saturation_vapour_pressure.pvs_water(T))
        RH = pv / pvs
        lv = float(f.latent_heat_vapourisation.lv(T))

        DTp = f.diffusion_thermics.D(T, p)
        KTp = f.diffusion_thermics.K(T, p)
        lambdaD = f.diffusion_kinetics.lambdaD(DTp, T)
        lambdaK = f.diffusion_kinetics.lambdaK(T, p)
        Sc = f.trivia.air_schmidt_number(
            dynamic_viscosity=air_viscosity, diffusivity=DTp,
            density=air_density,
        )
        v = np.asarray(f.particle_shape_and_density.mass_to_volume(mass))
        r = np.asarray(f.trivia.radius(v))
        Dr = np.asarray(f.diffusion_kinetics.D(DTp, r, lambdaD))
        Kr = np.asarray(f.diffusion_kinetics.K(KTp, r, lambdaK))
        vent = np.asarray(
            f.ventilation.ventilation_coefficient(
                sqrt_re_times_cbrt_sc=f.trivia.sqrt_re_times_cbrt_sc(
                    Re=reynolds_number, Sc=Sc
                )
            )
        )
        sgm = np.asarray(f.surface_tension.sigma(T, v, dry_volume, f_org))
        Fk = np.asarray(f.drop_growth.Fk(T=T, lv=lv, K=vent * Kr))
        Fd = np.asarray(f.drop_growth.Fd(T=T, pvs=pvs, D=vent * Dr))
        RH_eq = np.asarray(
            f.hygroscopicity.RH_eq(
                r, T, kappa, dry_volume / const.PI_4_3, sgm
            )
        )
        r_dr_dt = np.asarray(
            f.drop_growth.r_dr_dt(RH_eq=RH_eq, RH=RH, Fk=Fk, Fd=Fd)
        )
        dm_dt = np.asarray(
            f.particle_shape_and_density.dm_dt(r=r, r_dr_dt=r_dr_dt)
        )
        dy_dt = np.empty_like(y)
        dy_dt[idx_x:] = np.asarray(f.diffusion_coordinate.dx_dt(mass, dm_dt))
        sum_n_dm_dt = np.sum(n * dm_dt)
        dy_dt[idx_thd] = dthd_dt + float(
            f.state_variable_triplet.dthd_dt(
                rhod, thd, T, dqv_dt - sum_n_dm_dt / m_d, lv
            )
        )
        return dy_dt

    def host_step(sim):
        particles = sim["particles"]
        env = dict(sim["env"])
        if int(particulator.mesh.n_cell) != 1:
            raise NotImplementedError(
                "scipy cross-check solver supports single-cell envs only"
            )
        n = np.asarray(particles.multiplicity, dtype=float)
        alive = n > 0
        mass = np.asarray(particles.ext("signed water mass"), dtype=float)
        dry_volume = np.asarray(particles.ext("dry volume"), dtype=float)
        kappa = np.asarray(resolver.get(particles, "kappa"), dtype=float)
        f_org = np.asarray(
            resolver.get(particles, "dry volume organic fraction"),
            dtype=float,
        )
        reynolds = np.asarray(
            resolver.get(particles, "Reynolds number", env=env), dtype=float
        )

        thd = float(np.asarray(env["thd"])[0])
        qv = float(np.asarray(env["qv"])[0])
        rhod = float(np.asarray(env["rhod"])[0])
        pthd = float(np.asarray(env["pred_thd"])[0])
        pqv = float(np.asarray(env["pred_qv"])[0])
        prhod = float(np.asarray(env["pred_rhod"])[0])
        m_d = float(np.asarray(env["m_d"])[0])
        air_density = float(np.asarray(env["air_density"])[0])
        air_viscosity = float(np.asarray(env["air_viscosity"])[0])

        dthd_dt = (pthd - thd) / dt
        dqv_dt = (pqv - qv) / dt
        drhod_dt = (prhod - rhod) / dt

        mass_alive = np.where(alive, mass, 1e-18)
        y0 = np.empty(1 + int(alive.sum()))
        y0[idx_thd] = thd
        y0[idx_x:] = np.asarray(
            f.diffusion_coordinate.x(mass_alive[alive])
        )
        qt = qv + np.sum(n[alive] * mass_alive[alive]) / m_d

        integ = scipy.integrate.solve_ivp(
            fun=odesys,
            args=(
                kappa[alive], f_org[alive], dry_volume[alive], n[alive],
                reynolds[alive], dthd_dt, dqv_dt, drhod_dt, m_d,
                air_density, air_viscosity, rhod, qt,
            ),
            t_span=(0, dt),
            t_eval=(dt,),
            y0=y0,
            rtol=rtol,
            atol=0,
            method="LSODA",
        )
        assert integ.success, integ.message
        y1 = integ.y[:, 0]

        new_mass = mass.copy()
        new_mass[alive] = np.asarray(
            f.diffusion_coordinate.mass(y1[idx_x:])
        )
        new_thd = float(y1[idx_thd])
        new_qv = qt + dqv_dt * dt - np.sum(n[alive] * new_mass[alive]) / m_d

        dtype = particulator.dtype
        particles = particles.set_ext(
            "signed water mass", jnp.asarray(new_mass, dtype=dtype)
        )
        env["pred_thd"] = jnp.asarray([new_thd], dtype=dtype)
        env["pred_qv"] = jnp.asarray([new_qv], dtype=dtype)
        from ..environments.impl.moist import recalc_thermo

        (env["T"], env["p"], env["RH"], env["air_density"],
         env["air_viscosity"]) = recalc_thermo(
            particulator.formulae, env["pred_thd"], env["pred_qv"],
            env["pred_rhod"],
        )
        counters = dict(sim["counters"])
        counters["condensation_RH_max"] = jnp.maximum(
            counters["condensation_RH_max"],
            env["RH"].astype(counters["condensation_RH_max"].dtype),
        )
        return {**sim, "particles": particles, "env": env,
                "counters": counters}

    return host_step


def patch_particulator(particulator):
    """swap the Condensation stage of the composed step for the scipy
    host-side solver; subsequent ``particulator.run`` calls execute the
    hybrid chain (device-jitted stages around a host ODE solve)"""
    assert "Condensation" in particulator.dynamics
    cond = particulator.dynamics["Condensation"]
    stages = []
    for name, dynamic in particulator.dynamics.items():
        if not hasattr(dynamic, "make_step"):
            continue
        if name == "Condensation":
            stages.append(_make_host_step(particulator, cond))
        else:
            stages.append(jax.jit(dynamic.make_step(particulator)))
    env = particulator.environment
    if hasattr(env, "make_commit_step"):
        stages.append(jax.jit(env.make_commit_step(particulator)))

    def full_step(sim):
        for fn in stages:
            sim = fn(sim)
        return sim

    def multi_step(sim, n_steps):
        for _ in range(int(n_steps)):
            sim = full_step(sim)
        return sim

    particulator._step_fn_raw = full_step
    particulator._step_fn = full_step
    particulator._multi_step_fn = multi_step
    particulator.condensation_solver_patched = types.SimpleNamespace(
        kind="scipy_ode"
    )
    return particulator
