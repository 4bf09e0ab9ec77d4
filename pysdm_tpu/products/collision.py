"""Collision-rate products (parity: reference ``PySDM/products/collision/``);
counters are accumulated deterministically inside the collision step."""

import warnings

from .impl import Product

#: largest integer the f32 rate-accumulation pipeline represents exactly
F32_EXACT_MAX = float(2**24)


class _CounterProduct(Product):
    counter_name = None

    def __init__(self, name=None, unit="s^-1"):
        super().__init__(name=name or self.counter_name, unit=unit)
        self._precision_warned = False

    def _impl(self, **kwargs):
        vals = self.particulator.get_counter(self.counter_name)
        self.particulator.reset_counter(self.counter_name)
        if not self._precision_warned:
            try:
                step_max = float(
                    self.particulator.get_counter("rate_step_sum_max")[0]
                )
            except KeyError:
                step_max = 0.0
            if step_max > F32_EXACT_MAX:
                self._precision_warned = True
                warnings.warn(
                    f"per-step per-cell rate sums reached {step_max:.3g} >"
                    f" 2^24: the f32 rate-counter accumulation is no longer"
                    f" exact (~1e-7 relative error; reference uses i64"
                    f" atomics) — read products more often or reduce"
                    f" multiplicities to restore exactness"
                )
        return vals


class CollisionRatePerGridbox(_CounterProduct):
    counter_name = "collision_rate"


class CollisionRateDeficitPerGridbox(_CounterProduct):
    counter_name = "collision_rate_deficit"


class CoalescenceRatePerGridbox(_CounterProduct):
    counter_name = "coalescence_rate"


class BreakupRatePerGridbox(_CounterProduct):
    counter_name = "breakup_rate"


class BreakupRateDeficitPerGridbox(_CounterProduct):
    counter_name = "breakup_rate_deficit"


class CollisionTimestepMean(Product):
    """time-averaged adaptive collision substep length since the previous
    read, per cell (reference ``collision_timestep_mean.py``:
    n_steps * dt / accumulated substep count; NaN where no substeps ran)"""

    def __init__(self, name=None, unit="s"):
        super().__init__(name=name or "collision timestep mean", unit=unit)
        self._steps_at_last_read = 0

    def _impl(self, **kwargs):
        import numpy as np

        p = self.particulator
        steps = max(p.n_steps - self._steps_at_last_read, 1)
        self._steps_at_last_read = p.n_steps
        n = np.asarray(p.get_counter("collision_n_substep"), dtype=float)
        p.reset_counter("collision_n_substep")
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(n > 0, steps * p.dt / n, np.nan)


class CollisionTimestepMin(Product):
    """dt / substep count per cell at the last step (reference
    ``collision_timestep_min.py`` tracks the extremum between reads; the
    vectorized dynamic keeps one substep count per cell per step)"""

    def __init__(self, name=None, unit="s"):
        super().__init__(name=name or "collision timestep min", unit=unit)

    def _impl(self, **kwargs):
        import numpy as np

        p = self.particulator
        n = np.maximum(
            np.asarray(p.get_counter("collision_n_substep"), dtype=float), 1.0
        )
        return p.dt / n
