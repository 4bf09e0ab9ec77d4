from . import spectral_sampling
