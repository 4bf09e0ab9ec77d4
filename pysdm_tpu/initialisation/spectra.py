"""Size spectra (parity: reference ``PySDM/initialisation/spectra/``):
scipy.stats-backed distributions with a norm factor. Host-side (init only)."""

import math

import numpy as np
from scipy.stats import expon, gamma as gamma_dist, lognorm, norm, uniform
from scipy.interpolate import interp1d

# spans the sampling cdf range (reference spectra/sum.py: linspace over
# default_cdf_range) so ConstantMultiplicity percentile queries stay in bounds
default_interpolation_grid = tuple(np.linspace(0.00001, 0.99999, 999))


class Spectrum:
    def __init__(self, distribution, distribution_params, norm_factor):
        self.distribution = distribution
        self.distribution_params = distribution_params
        self.norm_factor = norm_factor

    def size_distribution(self, arg):
        return self.norm_factor * self.distribution.pdf(arg, *self.distribution_params)

    def pdf(self, arg):
        return self.size_distribution(arg) / self.norm_factor

    def cdf(self, arg):
        return self.distribution.cdf(arg, *self.distribution_params)

    def cumulative(self, arg):
        return self.norm_factor * self.distribution.cdf(arg, *self.distribution_params)

    def percentiles(self, cdf_values):
        return self.distribution.ppf(np.asarray(cdf_values), *self.distribution_params)

    def median(self):
        return self.percentiles(0.5)


class Exponential(Spectrum):
    def __init__(self, norm_factor, scale):
        super().__init__(expon, (0, scale), norm_factor)

    @property
    def scale(self):
        return self.distribution_params[1]


class Lognormal(Spectrum):
    def __init__(self, norm_factor: float, m_mode: float, s_geom: float):
        super().__init__(lognorm, (math.log(s_geom), 0, m_mode), norm_factor)

    @property
    def s_geom(self):
        return math.exp(self.distribution_params[0])

    @property
    def m_mode(self):
        return self.distribution_params[2]

    @property
    def median(self):  # property in reference Lognormal
        return self.m_mode

    @property
    def geometric_mean(self):
        return self.s_geom

    def __str__(self):
        return (
            f"{self.__class__.__name__}:"
            f" (N={self.norm_factor:.3g},"
            f" m_mode={self.m_mode:.3g},"
            f" s_geom={self.s_geom:.3g})"
        )


class Gamma(Spectrum):
    def __init__(self, norm_factor, k, theta):
        super().__init__(gamma_dist, (k, 0, theta), norm_factor)


class Gaussian(Spectrum):
    def __init__(self, norm_factor, loc, scale):
        super().__init__(norm, (loc, scale), norm_factor)


class TopHat:
    def __init__(self, norm_factor, endpoints):
        self.norm_factor = norm_factor
        self.endpoints = endpoints
        self._mn = endpoints[0]
        self._mx = endpoints[1]

    def cumulative(self, arg):
        cdf = (np.minimum(self._mx, np.maximum(self._mn, arg)) - self._mn) / (
            self._mx - self._mn
        )
        return self.norm_factor * cdf

    def percentiles(self, cdf_values):
        return (self._mx - self._mn) * np.asarray(cdf_values) + self._mn

    def median(self):
        return self.percentiles(0.5)


class Sum:
    """sum of spectra (reference spectra/sum.py): cumulative adds; percentiles
    via interpolation of the combined cdf"""

    def __init__(self, spectra, interpolation_grid=None):
        self.spectra = spectra
        self.norm_factor = sum(s.norm_factor for s in self.spectra)
        interpolation_grid = interpolation_grid or default_interpolation_grid
        percentiles = [s.percentiles(interpolation_grid) for s in self.spectra]
        cdf_arg = np.zeros(len(interpolation_grid) * len(self.spectra) + 1)
        cdf_arg[1:] = np.concatenate(percentiles)
        cdf_arg = np.sort(cdf_arg)
        cdf = self.cumulative(cdf_arg) / self.norm_factor
        self.inverse_cdf = interp1d(cdf, cdf_arg)

    def size_distribution(self, arg):
        return sum(s.size_distribution(arg) for s in self.spectra)

    def cumulative(self, arg):
        return sum(s.cumulative(arg) for s in self.spectra)

    def percentiles(self, cdf_values):
        return self.inverse_cdf(cdf_values)

    def median(self):
        return self.percentiles(0.5)
