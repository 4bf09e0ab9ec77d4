"""Aqueous-chemistry products (parity: reference
``PySDM/products/aqueous_chemistry/``): per-cell volume-weighted pH, aqueous
mole concentrations, and gaseous mixing ratios."""

import numpy as np

from .impl import Product, MomentProduct
from ..dynamics.impl.chemistry_utils import GASEOUS_COMPOUNDS
from ..ops import chemistry as chem_ops
from ..dynamics.impl import chemistry_utils as chem


class Acidity(MomentProduct):
    """volume(or number)-weighted mean pH per cell (reference ``acidity.py``)"""

    def __init__(self, *, radius_range=(0, np.inf), weighting="volume", name=None,
                 unit="dimensionless"):
        super().__init__(name=name or "pH", unit=unit)
        self.radius_range = radius_range
        self.weighting_rank = {"volume": 1, "number": 0}[weighting]

    def _impl(self, **kwargs):
        import jax.numpy as jnp

        p = self.particulator
        formulae = p.formulae
        particles = p.sim_state["particles"]
        resolver = p._resolver
        volume = resolver.get(particles, "volume")
        alive = particles.multiplicity > 0
        safe_vol = jnp.where(alive, volume, 1e-30)
        conc = {
            key: particles.ext(f"moles_{key}") / safe_vol
            for key in chem.AQUEOUS_COMPOUNDS
        }
        T_c = p.sim_state["env"]["T"]
        eq_c = {k: v.at(T_c) for k, v in chem.equilibrium_consts(formulae).items()}
        eq_drop = {k: v[particles.cell_id] for k, v in eq_c.items()}
        const = formulae.constants
        H = chem_ops.equilibrate_H(
            conc=conc,
            K_drop=eq_drop,
            K_H2O=const.K_H2O,
            H_min=float(formulae.trivia.pH2H(14.0)),
            H_max=float(formulae.trivia.pH2H(-1.0)),
        )
        pH = np.asarray(formulae.trivia.H2pH(H))
        # volume-weighted per-cell mean over the radius range
        import jax

        r = np.asarray(resolver.get(particles, "radius"))
        w = np.asarray(particles.multiplicity, dtype=float) * np.where(
            self.weighting_rank, np.asarray(volume), 1.0
        )
        mask = (
            np.asarray(alive)
            & (r >= self.radius_range[0])
            & (r < self.radius_range[1])
        )
        cell = np.asarray(particles.cell_id)
        n_cell = p.mesh.n_cell
        num = np.bincount(cell, weights=np.where(mask, w * pH, 0.0), minlength=n_cell)
        den = np.bincount(cell, weights=np.where(mask, w, 0.0), minlength=n_cell)
        return np.where(den > 0, num / np.maximum(den, 1e-300), np.nan)


class AqueousMoleFraction(MomentProduct):
    """total aqueous moles of a compound per dry-air mole fraction"""

    def __init__(self, key, name=None, unit="dimensionless"):
        super().__init__(name=name or f"aq_{key}", unit=unit)
        self.key = key

    def _impl(self, **kwargs):
        p = self.particulator
        _, moles = self._download_moment(
            attr=f"moles_{self.key}", rank=1, skip_division_by_m0=True
        )
        const = p.formulae.constants
        rhod = p.get_env("rhod")
        dry_air_moles = rhod * p.mesh.dv / const.Md
        return moles / dry_air_moles


class GaseousMoleFraction(Product):
    """trace-gas mole fraction from the env mixing ratio"""

    def __init__(self, key, name=None, unit="dimensionless"):
        super().__init__(name=name or f"gas_{key}", unit=unit)
        self.key = key

    def register(self, builder):
        super().register(builder)
        self.specific_gravity = chem.SpecificGravities(
            builder.formulae.constants
        )[GASEOUS_COMPOUNDS[self.key]]

    def _impl(self, **kwargs):
        compound = GASEOUS_COMPOUNDS[self.key]
        mixing_ratio = self.particulator.get_env(f"chem_{compound}")
        return mixing_ratio / self.specific_gravity / (1 + mixing_ratio)
