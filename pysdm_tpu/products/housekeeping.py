"""Housekeeping products (parity: reference ``PySDM/products/housekeeping/``)."""

import time

import numpy as np

from .impl import Product, MomentProduct


class WallTime(Product):
    """reset-on-read wall-clock timer (reference housekeeping/timers.py)"""

    def __init__(self, name=None):
        super().__init__(name=name or "wall time")
        self._start = time.perf_counter()

    def register(self, builder):
        super().register(builder)
        self.reset()

    def reset(self):
        self._start = time.perf_counter()

    def _impl(self, **kwargs):
        self.particulator.block_until_ready()
        return np.asarray(time.perf_counter() - self._start)

    def shape_for_output(self, result):
        return ()

    def get(self, **kwargs):
        return float(self._impl())


class CPUTime(Product):
    def __init__(self, name=None):
        super().__init__(name=name or "CPU time")
        self._start = time.process_time()

    def register(self, builder):
        super().register(builder)
        self.reset()

    def reset(self):
        self._start = time.process_time()

    def get(self, **kwargs):
        self.particulator.block_until_ready()
        return float(time.process_time() - self._start)


class Time(Product):
    def __init__(self, name=None):
        super().__init__(name=name or "time")

    def get(self, **kwargs):
        return self.particulator.n_steps * self.particulator.dt


class SuperDropletCountPerGridbox(MomentProduct):
    def __init__(self, name=None):
        super().__init__(name=name or "super droplet count per gridbox")

    def _impl(self, **kwargs):
        particles = self.particulator.sim_state["particles"]
        import jax

        counts = jax.ops.segment_sum(
            (particles.multiplicity > 0).astype(np.int32),
            particles.cell_id,
            num_segments=self.particulator.mesh.n_cell,
        )
        return np.asarray(counts)


class DynamicWallTime(Product):
    """wall time spent in a given dynamic, reset on read (reference
    ``dynamic_wall_time.py``). Requires the opt-in per-dynamic dispatch
    mode (``particulator.enable_per_dynamic_timing()``) — the production
    fused step hides per-dynamic splits from the host, so without the
    opt-in this reports NaN rather than a made-up number."""

    def __init__(self, dynamic, name=None, unit="s"):
        super().__init__(name=name or f"{dynamic} wall time", unit=unit)
        self.dynamic = dynamic

    def register(self, builder):
        super().register(builder)
        self.shape = ()

    def _impl(self, **kwargs):
        import numpy as np

        timers = self.particulator.timers
        value = timers.get(self.dynamic, np.nan)
        if self.dynamic in timers:
            timers[self.dynamic] = 0.0  # reset on read (reference semantics)
        return np.asarray(value)

    def shape_for_output(self, result):
        return ()
