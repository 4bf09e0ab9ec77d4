"""Freezing/ice products (parity: reference ``PySDM/products/freezing/``):
ice water content, frozen particle concentration and frozen fraction —
frozen particles are those with negative signed water mass."""

import numpy as np

from .impl import MomentProduct


class IceWaterContent(MomentProduct):
    """total ice mass per volume (kg/m^3)"""

    def __init__(self, name=None, unit="kg/m^3"):
        super().__init__(name=name or "ice water content", unit=unit)

    def _impl(self, **kwargs):
        m0, mass = self._download_moment(
            attr="water mass",
            rank=1,
            filter_attr="signed water mass",
            filter_range=(-np.inf, 0),
            skip_division_by_m0=True,
        )
        return mass / self.particulator.mesh.dv


class SpecificIceWaterContent(IceWaterContent):
    """ice mass per dry-air mass (kg/kg)"""

    def __init__(self, name=None, unit="kg/kg"):
        super().__init__(name=name or "specific ice water content", unit=unit)

    def _impl(self, **kwargs):
        iwc = super()._impl(**kwargs)
        rhod = self.particulator.get_env("rhod")
        return iwc / rhod


class FrozenParticleConcentration(MomentProduct):
    """number of frozen particles per volume (1/m^3)"""

    def __init__(self, name=None, unit="m^-3"):
        super().__init__(name=name or "frozen particle concentration", unit=unit)

    def _impl(self, **kwargs):
        m0, _ = self._download_moment(
            attr="water mass",
            rank=0,
            filter_attr="signed water mass",
            filter_range=(-np.inf, 0),
        )
        return m0 / self.particulator.mesh.dv


class FrozenFraction(MomentProduct):
    """fraction of the super-droplet-represented population that is frozen"""

    def __init__(self, name=None, unit="dimensionless"):
        super().__init__(name=name or "frozen fraction", unit=unit)

    def _impl(self, **kwargs):
        frozen, _ = self._download_moment(
            attr="water mass",
            rank=0,
            filter_attr="signed water mass",
            filter_range=(-np.inf, 0),
        )
        total, _ = self._download_moment(attr="water mass", rank=0)
        return np.where(total > 0, frozen / np.maximum(total, 1), 0.0)
