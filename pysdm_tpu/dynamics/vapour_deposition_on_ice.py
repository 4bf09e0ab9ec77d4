"""Vapour deposition on ice (parity: reference
``PySDM/dynamics/vapour_deposition_on_ice.py`` +
``backends/impl_numba/methods/deposition_methods.py``): capacitance-based
depositional growth/sublimation of frozen particles (Howell-factor form),
with per-cell feedback on predicted qv and thd — vectorized over particles
with deterministic segment-sum coupling."""

import jax
import jax.numpy as jnp


class VapourDepositionOnIce:
    def __init__(self):
        self.particulator = None

    def register(self, builder):
        self.particulator = builder.particulator
        assert (
            builder.formulae.particle_shape_and_density.supports_mixed_phase()
        )
        builder.request_attribute("Reynolds number")

    def make_step(self, particulator):
        f = particulator.formulae
        const = f.constants
        dt = particulator.dt
        n_cell = particulator.mesh.n_cell
        dv = particulator.mesh.dv

        def step(sim):
            particles = sim["particles"]
            env = dict(sim["env"])
            signed_mass = particles.ext("signed water mass")
            mult = particles.multiplicity
            cell = particles.cell_id
            ftype = signed_mass.dtype

            frozen = signed_mass < 0
            ice_mass = jnp.where(frozen, -signed_mass, 1e-18)

            T = env["T"][cell]
            p = env["p"][cell]
            RH = env["RH"][cell]
            rhod = env["rhod"][cell]
            pvs_w = f.saturation_vapour_pressure.pvs_water(T)
            pvs_i = f.saturation_vapour_pressure.pvs_ice(T)
            a_w_ice = pvs_i / pvs_w
            saturation_ratio_ice = RH / a_w_ice

            radius = f.particle_shape_and_density.mass_to_radius(signed_mass)
            radius = jnp.where(frozen, radius, 1e-9)
            ls = f.latent_heat_sublimation.ls(T)
            capacity = f.diffusion_ice_capacity.capacity(ice_mass)

            Dv = jnp.broadcast_to(jnp.asarray(f.diffusion_thermics.D(T, p)), T.shape)
            lambdaD = f.diffusion_ice_kinetics.lambdaD(T, p)
            D = f.diffusion_ice_kinetics.D(Dv, radius, lambdaD, T)
            Ka = jnp.broadcast_to(jnp.asarray(f.diffusion_thermics.K(T, p)), T.shape)
            lambdaK = f.diffusion_ice_kinetics.lambdaK(T, p)
            K = f.diffusion_ice_kinetics.K(Ka, radius, lambdaK, T, rhod)

            # ventilation factors 1 (reference deposition_methods.py TODO #1655)
            Fk = f.drop_growth.Fk(T=T, K=K, lv=ls)
            Fd = f.drop_growth.Fd(T=T, D=D, pvs=pvs_i)
            r_dr_dt = f.drop_growth.r_dr_dt(
                RH_eq=1.0, RH=saturation_ratio_ice, Fk=Fk, Fd=Fd
            )
            dm_dt = 4 * const.PI * capacity * r_dr_dt * const.rho_w

            active = frozen & (saturation_ratio_ice != 1.0) & (mult > 0)
            dm_dt = jnp.where(active, dm_dt, 0.0)

            # explicit Euler growth in the diffusion coordinate (reference
            # ``deposition_methods.py:130-133``); sublimation clamped at a
            # tiny positive ice mass (the mass coordinate could otherwise
            # cross zero and flip the particle liquid)
            x_old = f.diffusion_coordinate.x(ice_mass)
            dx_dt = f.diffusion_coordinate.dx_dt(ice_mass, dm_dt)
            x_new = x_old + dt * dx_dt
            mass_tentative = jnp.maximum(
                f.diffusion_coordinate.mass(x_new), 1e-21
            )
            dm = jnp.where(active, mass_tentative - ice_mass, 0.0)

            # per-cell deposition limiter on the ACTUAL coordinate-step mass
            # change (in a log coordinate it can far exceed dt*dm_dt for
            # freshly nucleated crystals): cell-total growth is scaled down
            # to the available vapour excess over ice saturation (deposition
            # physically stops at Si = 1). The reference has no guard — it
            # asserts/crashes on over-depletion
            # (``deposition_methods.py:113-114``). The vapour/heat feedback
            # below uses the same limited dm, so the water budget closes
            # exactly.
            pvs_i_cell = f.saturation_vapour_pressure.pvs_ice(env["T"])
            qv_sat_ice = const.eps * pvs_i_cell / (env["p"] - pvs_i_cell)
            # per-cell dry-air mass: constant m_d in a parcel (whose volume
            # evolves — the static mesh dv would leak water there), dv*rhod
            # on fixed Eulerian grids
            m_d_cell = env.get("m_d", dv * env["rhod"])
            avail = jnp.maximum(env["qv"] - qv_sat_ice, 0.0)
            # pre-limiter guards (in a log coordinate the explicit-Euler
            # mass of a freshly nucleated crystal can overflow exp() to inf,
            # or go indeterminate):
            # - NaN dm -> 0: an indeterminate step must not become growth;
            # - positive dm clamped to the cell's ENTIRE vapour budget
            #   (avail * m_d, no mult division): keeps huge-but-finite
            #   demands from overflowing the segment_sum below (dm * mult
            #   > f32max would make demand = inf, scale = avail/inf = 0,
            #   silently zeroing EVERY drop's deposition in the cell) while
            #   leaving ordinary demands to the exact proportional limiter.
            cap = (avail * m_d_cell)[cell]
            dm = jnp.where(jnp.isnan(dm), jnp.zeros((), ftype), dm)
            dm = jnp.minimum(dm, cap)
            demand = jax.ops.segment_sum(
                jnp.maximum(dm, 0.0) * mult.astype(ftype),
                cell,
                num_segments=n_cell,
            ) / m_d_cell
            scale = jnp.where(
                demand > avail, avail / jnp.maximum(demand, 1e-300), 1.0
            )
            dm = jnp.where(dm > 0, dm * scale[cell], dm)
            new_mass = jnp.maximum(ice_mass + dm, 1e-21)

            # per-cell vapour/heat feedback on the predicted fields
            delta_rv = jax.ops.segment_sum(
                -dm * mult.astype(ftype), cell, num_segments=n_cell
            ) / m_d_cell
            env["pred_qv"] = env["pred_qv"] + delta_rv
            dthd = f.state_variable_triplet.dthd_dt(
                rhod=env["rhod"],
                thd=env["pred_thd"],
                T=env["T"],
                d_water_vapour_mixing_ratio__dt=delta_rv / dt,
                lv=f.latent_heat_sublimation.ls(env["T"]),
            ) * dt
            env["pred_thd"] = env["pred_thd"] + dthd

            signed_mass = jnp.where(active, -new_mass, signed_mass)

            particles = particles.set_ext("signed water mass", signed_mass)
            return {**sim, "particles": particles, "env": env}

        return step
