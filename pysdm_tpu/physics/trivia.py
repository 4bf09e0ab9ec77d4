"""Shared helper formulae ("trivia").

Behavioural parity with reference ``PySDM/physics/trivia.py`` — same method
names and math, expressed with ``jax.numpy`` so everything traces under jit.
All methods take the constants namespace as first argument (bound by
``Formulae``).
"""

import jax.numpy as jnp


class Trivia:
    @staticmethod
    def volume_of_density_mass(const, rho, m):
        return m / rho

    @staticmethod
    def radius(const, volume):
        return jnp.power(volume / const.PI_4_3, const.ONE_THIRD)

    @staticmethod
    def area(const, radius):
        return const.PI * const.FOUR * jnp.power(radius, const.TWO)

    @staticmethod
    def volume(const, radius):
        return const.PI_4_3 * jnp.power(radius, const.THREE)

    @staticmethod
    def sphere_surface(const, diameter):
        return const.PI * diameter**2

    @staticmethod
    def explicit_euler(const, y, dt, dy_dt):
        return y + dt * dy_dt

    @staticmethod
    def within_tolerance(const, error_estimate, value, rtol):
        return error_estimate < rtol * jnp.abs(value)

    @staticmethod
    def H2pH(const, H):
        return -jnp.log10(H * 1e-3)

    @staticmethod
    def pH2H(const, pH):
        return jnp.power(10.0, -pH) * 1e3

    @staticmethod
    def vant_hoff(const, K, dH, T, *, T_0):
        return K * jnp.exp(-dH / const.R_str * (1 / T - 1 / T_0))

    @staticmethod
    def tdep2enthalpy(const, tdep):
        return -tdep * const.R_str

    @staticmethod
    def arrhenius(const, A, Ea, T):
        return A * jnp.exp(-Ea / (const.R_str * T))

    @staticmethod
    def mole_fraction_2_mixing_ratio(const, mole_fraction, specific_gravity):
        return specific_gravity * mole_fraction / (1 - mole_fraction)

    @staticmethod
    def mixing_ratio_2_mole_fraction(const, mixing_ratio, specific_gravity):
        return mixing_ratio / (specific_gravity + mixing_ratio)

    @staticmethod
    def p_d(const, p, water_vapour_mixing_ratio):
        return p * (1 - 1 / (1 + const.eps / water_vapour_mixing_ratio))

    @staticmethod
    def th_std(const, p, T):
        return T * jnp.power(const.p1000 / p, const.Rd_over_c_pd)

    @staticmethod
    def unfrozen(const, signed_water_mass):
        return signed_water_mass > 0

    @staticmethod
    def unfrozen_and_saturated(const, signed_water_mass, relative_humidity):
        return (signed_water_mass > 0) & (relative_humidity > 1)

    @staticmethod
    def unfrozen_and_ice_saturated(const, signed_water_mass, relative_humidity_ice):
        return (signed_water_mass > 0) & (relative_humidity_ice > 1)

    @staticmethod
    def frozen_and_above_freezing_point(const, signed_water_mass, temperature):
        return (signed_water_mass < 0) & (temperature > const.T0)

    @staticmethod
    def erfinv_approx(const, c):
        """Vedder 1987 eqs. 11-12 approximation of the inverse error function"""
        return (
            2
            * jnp.sqrt(const.VEDDER_1987_A)
            * jnp.sinh(
                jnp.arcsinh(
                    jnp.arctanh(c)
                    / 2
                    / const.VEDDER_1987_b
                    / jnp.power(const.VEDDER_1987_A, const.ONE_AND_A_HALF)
                )
                / 3
            )
        )

    @staticmethod
    def isotopic_delta_2_ratio(const, delta, reference_ratio):
        return (delta + 1) * reference_ratio

    @staticmethod
    def isotopic_ratio_2_delta(const, ratio, reference_ratio):
        return ratio / reference_ratio - 1

    @staticmethod
    def isotopic_enrichment_to_delta_SMOW(const, E, delta_0_SMOW):
        return (E + 1) * (delta_0_SMOW + 1) - 1

    @staticmethod
    def mixing_ratio_to_specific_content(const, mixing_ratio):
        return mixing_ratio / (1 + mixing_ratio)

    @staticmethod
    def dn_dlogr(const, r, dn_dr):
        return jnp.log(10.0) * r * dn_dr

    @staticmethod
    def air_schmidt_number(const, dynamic_viscosity, diffusivity, density):
        return dynamic_viscosity / diffusivity / density

    @staticmethod
    def sqrt_re_times_cbrt_sc(const, Re, Sc):
        return jnp.power(Re, const.ONE_HALF) * jnp.power(Sc, const.ONE_THIRD)

    @staticmethod
    def K2C(const, TK):
        return TK - const.T0

    @staticmethod
    def C2K(const, TC):
        return TC + const.T0

    @staticmethod
    def poissonian_avoidance_function(const, r, dt):
        return jnp.exp(-r * dt)
