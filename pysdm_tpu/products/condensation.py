"""Condensation products (parity: reference ``PySDM/products/condensation/``):
peak supersaturation, adaptive-substep diagnostics, activable fraction."""

import numpy as np

from .impl import Product, MomentProduct


class PeakSupersaturation(Product):
    """max (RH - 1) since last read (reference ``peak_supersaturation.py``,
    reset-on-read via the condensation RH_max counter)"""

    def __init__(self, name=None, unit="dimensionless"):
        super().__init__(name=name or "S_max", unit=unit)

    def _impl(self, **kwargs):
        p = self.particulator
        rh_max = p.get_counter("condensation_RH_max")
        p.sim_state["counters"]["condensation_RH_max"] = (
            p.sim_state["counters"]["condensation_RH_max"] * 0.0
        )
        out = rh_max - 1.0
        return out * 100 if self.unit == "%" else out


class PeakSaturation(Product):
    """max RH (saturation S, incl. condensation substeps) since last read
    (reference ``products/condensation/peak_saturation.py`` — reset-on-read)"""

    def __init__(self, name=None, unit="dimensionless"):
        super().__init__(name=name or "peak saturation", unit=unit)

    def _impl(self, **kwargs):
        p = self.particulator
        rh_max = p.get_counter("condensation_RH_max")
        p.sim_state["counters"]["condensation_RH_max"] = (
            p.sim_state["counters"]["condensation_RH_max"] * 0.0
        )
        return rh_max


class CondensationTimestepMin(Product):
    """dt / max substep count per cell (reference ``condensation_timestep.py``)"""

    def __init__(self, name=None, unit="s"):
        super().__init__(name=name or "dt_cond_min", unit=unit)

    def _impl(self, **kwargs):
        p = self.particulator
        n = np.maximum(np.asarray(p.get_counter("condensation_n_substeps")), 1)
        return p.dt / n


class CondensationTimestepMax(CondensationTimestepMin):
    """dt / substep count per cell; with the lockstep vectorized solver the
    per-cell substep count is single-valued between reads, so min == max
    (reference ``CondensationTimestepMax`` tracks an extremum across steps)"""

    def __init__(self, name=None, unit="s"):
        super().__init__(name=name, unit=unit)
        self.name = name or "dt_cond_max"


class _EventRate(Product):
    """multiplicity-weighted activation-event rate per mass of dry air, time-
    averaged since the previous read; fetching resets the counter (reference
    ``event_rates.py``: count / (n_steps * dt * dv * rhod))"""

    counter_name = None

    def __init__(self, name=None, unit="s^-1 kg^-1"):
        super().__init__(name=name or self.counter_name, unit=unit)
        self._steps_at_last_read = 0

    def _impl(self, **kwargs):
        p = self.particulator
        steps = max(p.n_steps - self._steps_at_last_read, 1)
        self._steps_at_last_read = p.n_steps
        count = p.get_counter(self.counter_name)
        p.reset_counter(self.counter_name)
        rhod = p.get_env("rhod")
        return count / (steps * p.dt * p.mesh.dv * rhod)


class RipeningRate(_EventRate):
    counter_name = "condensation_ripening"


class ActivatingRate(_EventRate):
    counter_name = "condensation_activating"


class DeactivatingRate(_EventRate):
    counter_name = "condensation_deactivating"


class ActivableFraction(MomentProduct):
    """fraction of particles with critical supersaturation below the given
    S_max (reference ``activable_fraction.py``)"""

    def __init__(self, name=None, unit="dimensionless", filter_attr="critical supersaturation"):
        super().__init__(name=name or "activable fraction", unit=unit)
        self.filter_attr = filter_attr

    def _impl(self, S_max=0.0, **kwargs):
        import jax.numpy as jnp

        p = self.particulator
        particles = p.sim_state["particles"]
        f = p.formulae
        resolver = p._resolver
        # critical supersaturation per particle: S_cr(kappa, rd3, T, sgm)
        T = p.sim_state["env"]["T"][particles.cell_id]
        rd3 = particles.ext("dry volume") / f.constants.PI_4_3
        kappa = resolver.get(particles, "kappa")
        # critical supersaturation = Koehler curve at the critical radius
        r_cr = f.hygroscopicity.r_cr(kappa, rd3, T, f.constants.sgm_w)
        s_cr = f.hygroscopicity.RH_eq(r_cr, T, kappa, rd3, f.constants.sgm_w)
        activable = s_cr < 1.0 + S_max / 100.0
        import jax

        mult = particles.multiplicity
        n_cell = p.mesh.n_cell
        num = jax.ops.segment_sum(
            jnp.where(activable, mult, 0), particles.cell_id, num_segments=n_cell
        )
        den = jax.ops.segment_sum(mult, particles.cell_id, num_segments=n_cell)
        return np.asarray(num) / np.maximum(np.asarray(den), 1)
