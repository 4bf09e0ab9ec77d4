from . import spectral_sampling
from . import spatial_sampling
