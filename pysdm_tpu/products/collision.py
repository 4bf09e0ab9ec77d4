"""Collision-rate products (parity: reference ``PySDM/products/collision/``);
counters are accumulated deterministically inside the collision step."""

from .impl import Product


class _CounterProduct(Product):
    counter_name = None

    def __init__(self, name=None, unit="s^-1"):
        super().__init__(name=name or self.counter_name, unit=unit)

    def _impl(self, **kwargs):
        vals = self.particulator.get_counter(self.counter_name)
        self.particulator.reset_counter(self.counter_name)
        return vals


class CollisionRatePerGridbox(_CounterProduct):
    counter_name = "collision_rate"


class CollisionRateDeficitPerGridbox(_CounterProduct):
    counter_name = "collision_rate_deficit"


class CoalescenceRatePerGridbox(_CounterProduct):
    counter_name = "coalescence_rate"
