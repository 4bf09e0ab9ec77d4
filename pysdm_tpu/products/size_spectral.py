"""Size-spectral products (parity: reference ``PySDM/products/size_spectral/``)."""

import numpy as np

from .impl import Product, MomentProduct


class ParticleVolumeVersusRadiusLogarithmSpectrum(Product):
    """dv/dlnr per radius bin (reference
    ``particle_volume_versus_radius_logarithm_spectrum.py``): total particle
    volume per cell volume per unit ln(r), per bin"""

    def __init__(self, radius_bins_edges, name=None, unit="dimensionless", dry=False):
        super().__init__(name=name, unit=unit)
        self.radius_bins_edges = np.asarray(radius_bins_edges)
        self.attr = ("dry " if dry else "") + "volume"
        self.volume_bins_edges = None

    def register(self, builder):
        super().register(builder)
        builder.request_attribute("volume")
        self.volume_bins_edges = np.asarray(
            builder.formulae.trivia.volume(self.radius_bins_edges)
        )
        self.shape = (*self.particulator.mesh.grid, len(self.volume_bins_edges) - 1)

    def _impl(self, **kwargs):
        m0, mom = self.particulator.spectrum_moments(
            attr_name=self.attr,
            rank=1,
            attr_bins=self.volume_bins_edges,
            filter_attr=self.attr,
        )
        vals = (mom * m0).T  # (n_cell, n_bins): total volume per bin per cell
        vals *= 1 / np.diff(np.log(self.radius_bins_edges)) / self.particulator.mesh.dv
        return vals

    def shape_for_output(self, result):
        return self.shape


class ParticleSizeSpectrumPerVolume(Product):
    """dN/dlnr-style number spectrum dN/dr per volume of air
    (reference ``particle_size_spectrum_per_volume.py``)"""

    def __init__(self, radius_bins_edges, name=None, unit="m^-3 m^-1", dry=False):
        super().__init__(name=name, unit=unit)
        self.radius_bins_edges = np.asarray(radius_bins_edges)
        self.attr = ("dry " if dry else "") + "volume"
        self.volume_bins_edges = None

    def register(self, builder):
        super().register(builder)
        builder.request_attribute("volume")
        self.volume_bins_edges = np.asarray(
            builder.formulae.trivia.volume(self.radius_bins_edges)
        )
        self.shape = (*self.particulator.mesh.grid, len(self.volume_bins_edges) - 1)

    def _impl(self, **kwargs):
        m0, _ = self.particulator.spectrum_moments(
            attr_name=self.attr,
            rank=0,
            attr_bins=self.volume_bins_edges,
            filter_attr=self.attr,
        )
        vals = m0.T  # number per bin per cell
        vals = vals / np.diff(self.radius_bins_edges) / self.particulator.mesh.dv
        return vals

    def shape_for_output(self, result):
        return self.shape


class TotalParticleConcentration(MomentProduct):
    def __init__(self, name=None, unit="m^-3"):
        super().__init__(name=name or "total particle concentration", unit=unit)

    def _impl(self, **kwargs):
        m0, _ = self._download_moment(attr="volume", rank=0)
        return m0 / self.particulator.mesh.dv


class ParticleConcentration(MomentProduct):
    def __init__(self, radius_range=(0, np.inf), name=None, unit="m^-3"):
        super().__init__(name=name or "particle concentration", unit=unit)
        self.radius_range = radius_range

    def register(self, builder):
        super().register(builder)
        builder.request_attribute("radius")
        self.volume_range = tuple(
            np.asarray(builder.formulae.trivia.volume(np.asarray(self.radius_range)))
        )

    def _impl(self, **kwargs):
        m0, _ = self._download_moment(
            attr="volume", rank=0, filter_range=self.volume_range
        )
        return m0 / self.particulator.mesh.dv


class MeanRadius(MomentProduct):
    def __init__(self, name=None, unit="m", radius_range=(0, np.inf)):
        super().__init__(name=name or "mean radius", unit=unit)
        self.radius_range = radius_range

    def register(self, builder):
        super().register(builder)
        builder.request_attribute("radius")
        self.volume_range = tuple(
            np.asarray(builder.formulae.trivia.volume(np.asarray(self.radius_range)))
        )

    def _impl(self, **kwargs):
        _, m1 = self._download_moment(
            attr="radius", rank=1, filter_range=self.volume_range
        )
        return m1


class WaterMixingRatio(MomentProduct):
    """liquid water mass per mass of dry air within a radius range
    (reference ``water_mixing_ratio.py``)"""

    def __init__(self, radius_range=None, name=None, unit="dimensionless"):
        super().__init__(name=name or "water mixing ratio", unit=unit)
        self.radius_range = radius_range or (0, np.inf)

    def register(self, builder):
        super().register(builder)
        builder.request_attribute("water mass")
        self.volume_range = tuple(
            np.asarray(builder.formulae.trivia.volume(np.asarray(self.radius_range)))
        )

    def _impl(self, **kwargs):
        m0, m1 = self._download_moment(
            attr="water mass",
            rank=1,
            filter_range=self.volume_range,
            skip_division_by_m0=True,
        )
        mass_per_cell = m1  # total liquid water mass per cell
        rhod = self.particulator.get_env("rhod")
        return mass_per_cell / self.particulator.mesh.dv / rhod


class EffectiveRadius(MomentProduct):
    """ratio of 3rd to 2nd radius moment"""

    def __init__(self, radius_range=(0, np.inf), name=None, unit="m"):
        super().__init__(name=name or "effective radius", unit=unit)
        self.radius_range = radius_range

    def register(self, builder):
        super().register(builder)
        builder.request_attribute("radius")
        self.volume_range = tuple(
            np.asarray(builder.formulae.trivia.volume(np.asarray(self.radius_range)))
        )

    def _impl(self, **kwargs):
        _, m3 = self._download_moment(
            attr="radius", rank=3, filter_range=self.volume_range,
            skip_division_by_m0=True,
        )
        _, m2 = self._download_moment(
            attr="radius", rank=2, filter_range=self.volume_range,
            skip_division_by_m0=True,
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(m2 > 0, m3 / np.where(m2 > 0, m2, 1), 0.0)
