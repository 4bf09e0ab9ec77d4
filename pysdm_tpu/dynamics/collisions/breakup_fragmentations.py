"""Fragmentation functions (parity: reference
``PySDM/dynamics/collisions/breakup_fragmentations/``). Each returns
``(n_fragment, fragment_mass)`` per sorted slot given the pair's attributes
and a u01 draw. Limiters (reference ``fragmentation_methods.py:97+``) are
applied in ``ops.breakup``."""

import jax.numpy as jnp


class AlwaysN:
    required_attributes = ("water mass",)

    def __init__(self, n=1):
        self.n = n

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        n_fragment = jnp.full_like(mass_sum, float(self.n))
        return n_fragment, mass_sum / self.n


class ConstantMass:
    """every fragment has the prescribed mass"""

    required_attributes = ("water mass",)

    def __init__(self, c):
        self.c = c

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        fragment_mass = jnp.full_like(mass_sum, self.c)
        return mass_sum / fragment_mass, fragment_mass


class Exponential:
    """exponentially-distributed fragment size (reference expon_frag semantics)"""

    required_attributes = ("water mass",)

    def __init__(self, scale, vmin=0.0, nfmax=None):
        self.scale = scale  # volume scale
        self.vmin = vmin
        self.nfmax = nfmax

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        const = formulae.constants
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        frag_volume = -self.scale * jnp.log(jnp.maximum(1 - u01, 1e-30))
        frag_volume = jnp.maximum(frag_volume, self.vmin)
        fragment_mass = frag_volume * const.rho_w
        n_fragment = mass_sum / jnp.maximum(fragment_mass, 1e-300)
        if self.nfmax is not None:
            n_fragment = jnp.minimum(n_fragment, self.nfmax)
            fragment_mass = mass_sum / n_fragment
        return n_fragment, fragment_mass


class Gaussian:
    """normally-distributed fragment volume"""

    required_attributes = ("water mass",)

    def __init__(self, mu, sigma, vmin=0.0, nfmax=None):
        self.mu = mu
        self.sigma = sigma
        self.vmin = vmin
        self.nfmax = nfmax

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        const = formulae.constants
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        frag_volume = self.mu + self.sigma * formulae.trivia.erfinv_approx(
            jnp.clip(2 * u01 - 1, -0.999999, 0.999999)
        )
        frag_volume = jnp.maximum(frag_volume, self.vmin)
        fragment_mass = frag_volume * const.rho_w
        n_fragment = mass_sum / jnp.maximum(fragment_mass, 1e-300)
        if self.nfmax is not None:
            n_fragment = jnp.minimum(n_fragment, self.nfmax)
            fragment_mass = mass_sum / n_fragment
        return n_fragment, fragment_mass
