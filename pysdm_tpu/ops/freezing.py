"""Vectorized freezing/thaw ops (parity: reference
``PySDM/backends/impl_numba/methods/freezing_methods.py``): freezing is a sign
flip of the signed water mass (negative = ice); singular (freezing-temperature
attribute) and time-dependent (Poisson sampling of J_het * A_insol or
J_hom * V) variants, plus thaw above the freezing point."""

import jax.numpy as jnp


def a_w_ice_and_rh_ice(formulae, T, RH):
    """water activity of ice + RH wrt ice from cell T, RH (reference
    ``physics_methods.py:_a_w_ice_body``)"""
    pvs_w = formulae.saturation_vapour_pressure.pvs_water(T)
    pvs_i = formulae.saturation_vapour_pressure.pvs_ice(T)
    return pvs_i / pvs_w, RH * pvs_w / pvs_i


def _thaw_mask(formulae, signed_mass, T_drop, thaw):
    if not thaw:
        return jnp.zeros(signed_mass.shape, dtype=bool)
    return formulae.trivia.frozen_and_above_freezing_point(signed_mass, T_drop)


def freeze_singular(
    *, formulae, signed_mass, freezing_temperature, T_drop, RH_drop, thaw
):
    """freeze where T fell below the singular freezing temperature
    (reference ``_freeze_singular_body``)"""
    has_inp = freezing_temperature != 0
    thawing = _thaw_mask(formulae, signed_mass, T_drop, thaw) & has_inp
    freezing = (
        has_inp
        & ~thawing
        & formulae.trivia.unfrozen_and_saturated(signed_mass, RH_drop)
        & (T_drop <= freezing_temperature)
    )
    return jnp.where(freezing | thawing, -signed_mass, signed_mass)


def freeze_time_dependent(
    *, formulae, rand, signed_mass, immersed_surface_area,
    T_drop, RH_drop, a_w_ice_drop, dt, thaw,
):
    """INAS J_het Poisson freezing (reference ``_freeze_time_dependent_body``)"""
    has_insol = immersed_surface_area != 0
    thawing = _thaw_mask(formulae, signed_mass, T_drop, thaw) & has_insol
    candidate = (
        has_insol
        & ~thawing
        & formulae.trivia.unfrozen_and_saturated(signed_mass, RH_drop)
    )
    rate = (
        formulae.heterogeneous_ice_nucleation_rate.j_het(a_w_ice_drop)
        * immersed_surface_area
    )
    prob = 1.0 - formulae.trivia.poissonian_avoidance_function(rate, dt)
    freezing = candidate & (rand < prob)
    return jnp.where(freezing | thawing, -signed_mass, signed_mass)


def freeze_time_dependent_homogeneous(
    *, formulae, rand, signed_mass, volume,
    T_drop, RH_ice_drop, a_w_ice_drop, dt, thaw,
):
    """homogeneous J_hom Poisson freezing
    (reference ``_freeze_time_dependent_homogeneous_body``)"""
    f = formulae.homogeneous_ice_nucleation_rate
    thawing = _thaw_mask(formulae, signed_mass, T_drop, thaw)
    candidate = ~thawing & formulae.trivia.unfrozen_and_ice_saturated(
        signed_mass, RH_ice_drop
    )
    d_a_w_ice = (RH_ice_drop - 1.0) * a_w_ice_drop
    in_range = f.d_a_w_ice_within_range(d_a_w_ice)
    d_a_w_ice = f.d_a_w_ice_maximum(d_a_w_ice)
    rate = f.j_hom(T_drop, d_a_w_ice) * volume
    prob = 1.0 - formulae.trivia.poissonian_avoidance_function(rate, dt)
    freezing = candidate & in_range & (rand < prob)
    return jnp.where(freezing | thawing, -signed_mass, signed_mass)
