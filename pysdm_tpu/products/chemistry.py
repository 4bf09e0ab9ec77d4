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


class TotalDryMassMixingRatio(MomentProduct):
    """total dry-aerosol mass per mass of dry air (reference
    ``total_dry_mass_mixing_ratio.py``): density x total dry volume / dv / rhod"""

    def __init__(self, density, name=None, unit="kg/kg"):
        super().__init__(name=name or "total dry mass mixing ratio", unit=unit)
        self.density = density

    def _impl(self, **kwargs):
        _, total_dry_volume = self._download_moment(
            attr="dry volume", rank=1, skip_division_by_m0=True
        )
        rhod = self.particulator.get_env("rhod")
        return (
            self.density * total_dry_volume / self.particulator.mesh.dv / rhod
        )


class AqueousMassSpectrum(Product):
    """dry-radius-binned aqueous compound mass concentration per
    d(log10 diameter) (reference ``aqueous_mass_spectrum.py``)"""

    def __init__(self, *, key, dry_radius_bins_edges, specific=False,
                 name=None, unit="kg/m^3"):
        super().__init__(name=name or f"aqueous {key} mass spectrum", unit=unit)
        from ..dynamics.impl.chemistry_utils import (
            AQUEOUS_COMPOUNDS,
            _MOLAR_MASS_G_MOL,
        )
        from ..physics.si import si

        self.key = key
        self.dry_radius_bins_edges = np.asarray(dry_radius_bins_edges)
        self.molar_mass = (
            _MOLAR_MASS_G_MOL[AQUEOUS_COMPOUNDS[key][0]] * si.g / si.mole
        )
        self.specific = specific
        self.dry_volume_bins_edges = None

    def register(self, builder):
        super().register(builder)
        self.dry_volume_bins_edges = np.asarray(
            builder.formulae.trivia.volume(self.dry_radius_bins_edges)
        )
        self.shape = (
            *self.particulator.mesh.grid,
            len(self.dry_volume_bins_edges) - 1,
        )

    def _impl(self, **kwargs):
        m0, m1 = self.particulator.spectrum_moments(
            attr_name=f"moles_{self.key}",
            rank=1,
            attr_bins=self.dry_volume_bins_edges,
            filter_attr="dry volume",
        )
        vals = (m1 * m0).T  # total moles per bin per cell
        d_log10_d = np.diff(np.log10(2 * self.dry_radius_bins_edges))
        vals = vals * self.molar_mass / d_log10_d / self.particulator.mesh.dv
        if self.specific:
            rhod = np.asarray(self.particulator.get_env("rhod")).reshape(-1, 1)
            vals = vals / rhod
        return vals

    def shape_for_output(self, result):
        return self.shape


class SpecificAqueousMassSpectrum(AqueousMassSpectrum):
    def __init__(self, key, dry_radius_bins_edges, name=None,
                 unit="dimensionless"):
        super().__init__(
            key=key,
            dry_radius_bins_edges=dry_radius_bins_edges,
            specific=True,
            name=name or f"specific aqueous {key} mass spectrum",
            unit=unit,
        )
