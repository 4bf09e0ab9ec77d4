"""Freezing dynamic (parity: reference ``PySDM/dynamics/freezing.py``):
immersion freezing in singular (freezing-temperature spectrum) or
time-dependent (INAS J_het) formulation, homogeneous freezing, and thaw."""

import jax
import jax.numpy as jnp

from ..ops import freezing as frz_ops


class Freezing:
    def __init__(
        self,
        *,
        singular=True,
        homogeneous_freezing=False,
        immersion_freezing=True,
        thaw=False,
    ):
        self.singular = singular
        self.homogeneous_freezing = homogeneous_freezing
        self.immersion_freezing = immersion_freezing
        self.thaw = thaw
        self.enable = True
        self.particulator = None

    def register(self, builder):
        self.particulator = builder.particulator
        formulae = self.particulator.formulae
        assert formulae.particle_shape_and_density.supports_mixed_phase()
        builder.request_attribute("signed water mass")
        if self.singular:
            builder.request_attribute("freezing temperature")
        if not self.singular and self.immersion_freezing:
            assert formulae.heterogeneous_ice_nucleation_rate.variant != "Null"
            builder.request_attribute("immersed surface area")
        if self.homogeneous_freezing:
            assert formulae.homogeneous_ice_nucleation_rate.variant != "Null"
            builder.request_attribute("volume")
        self.u01_injection = builder.u01_injection
        if self.u01_injection:
            if not self.singular and self.immersion_freezing:
                builder.add_u01_purpose("freezing_immersion")
            if self.homogeneous_freezing:
                builder.add_u01_purpose("freezing_homogeneous")

    def make_step(self, particulator):
        formulae = particulator.formulae
        resolver = particulator._resolver
        dt = particulator.dt
        u01_injection = getattr(self, "u01_injection", False)
        singular = self.singular
        immersion = self.immersion_freezing
        homogeneous = self.homogeneous_freezing
        thaw = self.thaw
        # coalescence max-merges "freezing temperature" (ops/collisions.py
        # coalesce max_s path — the reference leaves this unwired, its
        # TODO #594) and sums "immersed surface area" (extensive row);
        # fragment T_fz under breakup is undefined in the reference too, so
        # that combination stays a loud error
        for dyn in particulator.dynamics.values():
            if getattr(dyn, "enable_breakup", False):
                raise NotImplementedError(
                    "handling T_fz during breakup not implemented"
                    " (undefined in the reference as well)"
                )

        def step(sim):
            particles = sim["particles"]
            env = sim["env"]
            key = sim["key"]
            cell = particles.cell_id
            signed_mass = particles.ext("signed water mass")
            T_drop = env["T"][cell]
            RH_drop = env["RH"][cell]
            a_w_ice_c, RH_ice_c = frz_ops.a_w_ice_and_rh_ice(
                formulae, env["T"], env["RH"]
            )

            if immersion:
                if singular:
                    signed_mass = frz_ops.freeze_singular(
                        formulae=formulae,
                        signed_mass=signed_mass,
                        freezing_temperature=particles.max_attr(
                            "freezing temperature"
                        ),
                        T_drop=T_drop,
                        RH_drop=RH_drop,
                        thaw=thaw,
                    )
                else:
                    key, sub = jax.random.split(key)
                    if u01_injection:
                        rand = sim["u01"]["freezing_immersion"].astype(
                            signed_mass.dtype
                        )
                    else:
                        rand = jax.random.uniform(
                            sub, signed_mass.shape, dtype=signed_mass.dtype
                        )
                    signed_mass = frz_ops.freeze_time_dependent(
                        formulae=formulae,
                        rand=rand,
                        signed_mass=signed_mass,
                        immersed_surface_area=particles.ext(
                            "immersed surface area"
                        ),
                        T_drop=T_drop,
                        RH_drop=RH_drop,
                        a_w_ice_drop=a_w_ice_c[cell],
                        dt=dt,
                        thaw=thaw,
                    )
            if homogeneous:
                key, sub = jax.random.split(key)
                if u01_injection:
                    rand = sim["u01"]["freezing_homogeneous"].astype(
                        signed_mass.dtype
                    )
                else:
                    rand = jax.random.uniform(
                        sub, signed_mass.shape, dtype=signed_mass.dtype
                    )
                volume = formulae.particle_shape_and_density.mass_to_volume(
                    jnp.abs(signed_mass)
                )
                signed_mass = frz_ops.freeze_time_dependent_homogeneous(
                    formulae=formulae,
                    rand=rand,
                    signed_mass=signed_mass,
                    volume=volume,
                    T_drop=T_drop,
                    RH_ice_drop=RH_ice_c[cell],
                    a_w_ice_drop=a_w_ice_c[cell],
                    dt=dt,
                    thaw=thaw,
                )
            particles = particles.set_ext("signed water mass", signed_mass)
            if particles.has_max("temperature of last freezing"):
                # record the ambient T at the freezing event; reset to NaN on
                # thaw (reference ``freezing_methods.py``
                # record_freezing_temperatures, run as the
                # TemperatureOfLastFreezing observer each step)
                rec = particles.max_attr("temperature of last freezing")
                unfrozen = formulae.trivia.unfrozen(signed_mass)
                rec = jnp.where(
                    unfrozen,
                    jnp.nan,
                    jnp.where(jnp.isnan(rec), T_drop, rec),
                )
                particles = particles.set_max(
                    "temperature of last freezing", rec
                )
            return {**sim, "particles": particles, "key": key}

        return step
