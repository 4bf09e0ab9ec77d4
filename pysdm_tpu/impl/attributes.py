"""Derived-attribute computation.

Replaces the reference's timestamped attribute dependency graph
(reference ``PySDM/attributes/impl/derived_attribute.py``): under jit there is
no caching to manage — derived attributes are pure functions of the state and
XLA common-subexpression-eliminates repeated evaluation. The registry maps the
reference's attribute names (``PySDM/attributes/``, ~45 classes) to derivation
functions.
"""

import jax.numpy as jnp

# attribute names stored as extensive rows (conserved sums under coalescence)
EXTENSIVE_NAMES = (
    "signed water mass",
    "water mass",  # alias: stored signed
    "dry volume",
    "dry volume organic",
    "kappa times dry volume",
    "immersed surface area",
    "heat",
    "moles_1H",
    "moles_2H",
    "moles_3H",
    "moles_16O",
    "moles_17O",
    "moles_18O",
    "relative fall momentum",
    # aqueous chemistry mole amounts
    "moles_N_mIII",
    "moles_N_V",
    "moles_S_IV",
    "moles_S_VI",
    "moles_C_IV",
    "moles_O3",
    "moles_H2O2",
)

MAXIMUM_NAMES = ("freezing temperature",)


def canonical_ext_name(name):
    return "signed water mass" if name == "water mass" else name


class AttributeResolver:
    """computes any requested attribute from a ParticleState + Formulae"""

    def __init__(self, formulae):
        self.formulae = formulae

    def get(self, state, name, env=None):
        f = self.formulae
        if name in ("multiplicity", "n"):
            return state.multiplicity
        if name == "cell id":
            return state.cell_id
        if name == "cell origin":
            return state.cell_origin
        if name == "position in cell":
            return state.position_in_cell
        if name == "signed water mass":
            return state.ext("signed water mass")
        if name == "water mass":
            return jnp.abs(state.ext("signed water mass"))
        if state.has_ext(name):
            return state.ext(name)
        if name in state.max_names:
            return state.max_attr(name)
        if name == "volume":
            return f.particle_shape_and_density.mass_to_volume(
                state.ext("signed water mass")
            )
        if name == "radius":
            return f.trivia.radius(self.get(state, "volume"))
        if name == "sqrt radius":
            return jnp.sqrt(self.get(state, "radius"))
        if name == "area":
            return f.trivia.area(self.get(state, "radius"))
        if name == "dry radius":
            return f.trivia.radius(state.ext("dry volume"))
        if name == "kappa":
            return state.ext("kappa times dry volume") / state.ext("dry volume")
        if name == "temperature":
            return state.ext("heat") / self.get(state, "water mass")  # heat = c_p m T
        if name == "dry volume organic fraction":
            if state.has_ext("dry volume organic"):
                return state.ext("dry volume organic") / state.ext("dry volume")
            return jnp.zeros_like(state.ext("signed water mass"))
        if name == "Reynolds number":
            # Re = 2 r rho_air |v_rel| / eta_air, from the relative fall
            # velocity and the cell's air density/viscosity (reference
            # ``attributes/physics/reynolds_number.py:8-34`` +
            # ``impl_numba/methods/physics_methods.py`` reynolds_number).
            # The reference registers a zeros DummyAttribute when
            # ventilation == Neglect (the coefficient is then 1 regardless);
            # mirror that, and also fall back to zeros when the env carries
            # no air density/viscosity fields (e.g. plain Box).
            if (
                f.ventilation.variant == "Neglect"
                or env is None
                or "air_density" not in env
            ):
                return jnp.zeros_like(state.ext("signed water mass"))
            return f.particle_shape_and_density.reynolds_number(
                radius=self.get(state, "radius"),
                velocity_wrt_air=self.get(state, "relative fall velocity"),
                dynamic_viscosity=env["air_viscosity"][state.cell_id],
                density=env["air_density"][state.cell_id],
            )
        if name in (
            "critical volume",
            "critical volume neglecting temperature variations",
        ):
            # kappa-Koehler critical wet volume at the ambient cell temperature
            # (reference ``attributes/physics/critical_volume.py`` +
            # ``physics_methods.py`` _critical_volume_body)
            if env is None:
                raise KeyError("critical volume requires the env (cell T)")
            T = env["T"][state.cell_id]
            v_dry = state.ext("dry volume")
            sgm = f.surface_tension.sigma(
                T,
                self.get(state, "volume"),
                v_dry,
                self.get(state, "dry volume organic fraction"),
            )
            r_cr = f.hygroscopicity.r_cr(
                self.get(state, "kappa"), v_dry / f.constants.PI_4_3, T, sgm
            )
            return f.trivia.volume(r_cr)
        if name in (
            "wet to critical volume ratio",
            "wet to critical volume ratio neglecting temperature variations",
        ):
            return self.get(state, "volume") / self.get(
                state, "critical volume", env
            )
        if name == "critical saturation":
            # supersaturation at the critical radius (reference
            # ``attributes/physics/critical_supersaturation.py``)
            if env is None:
                raise KeyError("critical saturation requires the env (cell T)")
            T = env["T"][state.cell_id]
            v_dry = state.ext("dry volume")
            rd3 = v_dry / f.constants.PI_4_3
            sgm = f.surface_tension.sigma(
                T, self.get(state, "critical volume", env), v_dry,
                self.get(state, "dry volume organic fraction"),
            )
            kappa = self.get(state, "kappa")
            r_cr = f.hygroscopicity.r_cr(kappa, rd3, T, sgm)
            return f.hygroscopicity.RH_eq(r_cr, T, kappa, rd3, sgm)
        if name == "equilibrium saturation":
            # kappa-Koehler equilibrium saturation at the ambient cell T
            # (reference ``attributes/physics/equilibrium_saturation.py``)
            if env is None:
                raise KeyError("equilibrium saturation requires the env")
            T = env["T"][state.cell_id]
            v_dry = state.ext("dry volume")
            v_wet = self.get(state, "volume")
            sgm = f.surface_tension.sigma(
                T, v_wet, v_dry,
                self.get(state, "dry volume organic fraction"),
            )
            return f.hygroscopicity.RH_eq(
                self.get(state, "radius"),
                T,
                self.get(state, "kappa"),
                v_dry / f.constants.PI_4_3,
                sgm,
            )
        if name == "hygroscopicity":  # reference alias for kappa
            return self.get(state, "kappa")
        if name.startswith("delta_"):
            # heavy-to-light isotopic ratio vs the VSMOW reference
            heavy = name[len("delta_"):]
            light = "1H" if heavy.endswith("H") else "16O"
            ratio = state.ext(f"moles_{heavy}") / state.ext(f"moles_{light}")
            return f.trivia.isotopic_ratio_2_delta(
                ratio, getattr(f.constants, f"VSMOW_R_{heavy}")
            )
        if name.startswith("conc_"):
            # aqueous concentration = mole amount / droplet (liquid) volume
            return state.ext("moles_" + name[len("conc_"):]) / self.get(
                state, "volume"
            )
        if name in ("terminal velocity", "relative fall velocity"):
            # relative fall velocity equals terminal velocity unless the
            # RelaxedVelocity dynamic maintains a momentum attribute
            if state.has_ext("relative fall momentum"):
                return state.ext("relative fall momentum") / self.get(
                    state, "water mass"
                )
            return self.terminal_velocity(state)
        raise KeyError(f"unknown attribute: {name}")

    def terminal_velocity(self, state):
        radius = self.get(state, "radius")
        f = self.formulae
        variant = f.terminal_velocity.variant
        if variant == "GunnKinzer1949":
            from ..dynamics.terminal_velocity import gunn_kinzer_v_term

            return gunn_kinzer_v_term(f.constants, radius)
        if variant == "PowerSeries":
            from ..dynamics.terminal_velocity import PowerSeries

            return PowerSeries()(radius)
        if hasattr(f.terminal_velocity, "v_term"):
            return f.terminal_velocity.v_term(radius)
        raise NotImplementedError(f"terminal velocity variant {variant}")
