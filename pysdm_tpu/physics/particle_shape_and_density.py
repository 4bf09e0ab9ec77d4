"""Particle shape & density variants
(parity: reference ``PySDM/physics/particle_shape_and_density/``)."""

import jax.numpy as jnp


class LiquidSpheres:
    @staticmethod
    def supports_mixed_phase(const=None):
        return False

    @staticmethod
    def mass_to_volume(const, mass):
        return mass / const.rho_w

    @staticmethod
    def volume_to_mass(const, volume):
        return const.rho_w * volume

    @staticmethod
    def radius_to_mass(const, radius):
        return const.rho_w * const.PI_4_3 * jnp.power(radius, const.THREE)

    @staticmethod
    def mass_to_radius(const, mass):
        return jnp.power(mass / const.rho_w / const.PI_4_3, const.ONE_THIRD)

    @staticmethod
    def reynolds_number(const, radius, velocity_wrt_air, dynamic_viscosity, density):
        return 2 * radius * velocity_wrt_air * density / dynamic_viscosity

    @staticmethod
    def dm_dt(const, r, r_dr_dt):
        return 4 * const.PI * const.rho_w * r * r_dr_dt

    @staticmethod
    def dm_dt_over_m(const, r, r_dr_dt):
        return 3 / r**2 * r_dr_dt

    @staticmethod
    def r_dr_dt(const, r, dm_dt_over_m):
        return r**2 / 3 * dm_dt_over_m


class MixedPhaseSpheres:
    """negative (signed) water mass represents the ice phase"""

    @staticmethod
    def supports_mixed_phase(const=None):
        return True

    @staticmethod
    def mass_to_volume(const, mass):
        return jnp.maximum(0.0, mass) / const.rho_w + jnp.minimum(0.0, mass) / const.rho_i

    @staticmethod
    def volume_to_mass(const, volume):
        return (
            jnp.maximum(0.0, volume) * const.rho_w + jnp.minimum(0.0, volume) * const.rho_i
        )

    @staticmethod
    def radius_to_mass(const, radius):
        vol = const.PI_4_3 * radius**3
        return jnp.maximum(0.0, vol) * const.rho_w + jnp.minimum(0.0, vol) * const.rho_i

    @staticmethod
    def mass_to_radius(const, mass):
        return jnp.power(
            jnp.maximum(0.0, mass) / const.PI_4_3 / const.rho_w, const.ONE_THIRD
        ) + jnp.power(
            -jnp.minimum(0.0, mass) / const.PI_4_3 / const.rho_i, const.ONE_THIRD
        )

    @staticmethod
    def reynolds_number(const, radius, velocity_wrt_air, dynamic_viscosity, density):
        return 2 * radius * velocity_wrt_air * density / dynamic_viscosity

    @staticmethod
    def dm_dt(const, r, r_dr_dt):
        return 4 * const.PI * const.rho_w * r * r_dr_dt

    @staticmethod
    def dm_dt_over_m(const, r, r_dr_dt):
        return 3 / r**2 * r_dr_dt

    @staticmethod
    def r_dr_dt(const, r, dm_dt_over_m):
        return r**2 / 3 * dm_dt_over_m


class ColumnarIce:
    """columnar ice crystals (Spichtinger & Gierens 2009 mass-length relations)"""

    @staticmethod
    def supports_mixed_phase(const=None):
        return True

    @staticmethod
    def mass_to_volume(const, mass):
        return -mass / const.columnar_bulk_ice_density

    @staticmethod
    def volume_to_mass(const, volume):
        return -const.columnar_bulk_ice_density * volume

    @staticmethod
    def polar_radius_empirical_parametrisation(const, mass):
        """column length/2 from mass; piecewise power law (tab. 1 S&G 2009)"""
        m = jnp.abs(mass)
        small = m < const.columnar_ice_mass_transition
        length = jnp.where(
            small,
            jnp.power(m / const.columnar_ice_length_alpha_1, 1 / const.columnar_ice_length_beta_1),
            jnp.power(m / const.columnar_ice_length_alpha_2, 1 / const.columnar_ice_length_beta_2),
        )
        return length / 2

    @staticmethod
    def aspect_ratio_empirical_parametrisation(const, mass):
        m = jnp.abs(mass)
        small = m < const.columnar_ice_mass_transition
        length = jnp.where(
            small,
            jnp.power(m / const.columnar_ice_length_alpha_1, 1 / const.columnar_ice_length_beta_1),
            jnp.power(m / const.columnar_ice_length_alpha_2, 1 / const.columnar_ice_length_beta_2),
        )
        # diameter from volume of cylinder: V = pi/4 d^2 L
        volume = m / const.columnar_bulk_ice_density
        diameter = jnp.sqrt(4 * volume / const.PI / length)
        return length / diameter


VARIANTS = {
    "LiquidSpheres": LiquidSpheres,
    "MixedPhaseSpheres": MixedPhaseSpheres,
    "ColumnarIce": ColumnarIce,
}


class PorousSpheroid:
    """porous spheroids (Shima et al. 2020) / prolate spheroids
    (Spichtinger & Gierens 2009) geometry helpers (reference
    ``particle_shape_and_density/porous_spheroids.py``)"""

    @staticmethod
    def supports_mixed_phase(const=None):
        return True

    @staticmethod
    def aspect_ratio(const, polar_radius, equatorial_radius):
        return polar_radius / equatorial_radius

    @staticmethod
    def equatorial_radius(const, polar_radius, aspect_ratio):
        return polar_radius / aspect_ratio

    @staticmethod
    def polar_radius(const, equatorial_radius, aspect_ratio):
        return equatorial_radius * aspect_ratio

    @staticmethod
    def eccentricity(const, aspect_ratio):
        return jnp.sqrt(1 - aspect_ratio**-2.0)


VARIANTS["PorousSpheroid"] = PorousSpheroid
