"""Optical products (parity: reference ``PySDM/products/optical/``)."""

from .impl import Product


class CloudAlbedo(Product):
    """cloud albedo from optical depth (reference ``cloud_albedo.py``;
    requires the ``optical_albedo`` formulae family, e.g. Bohren1987)"""

    def __init__(self, *, name=None, unit="dimensionless"):
        super().__init__(name=name or "cloud albedo", unit=unit)

    def _impl(self, *, optical_depth, **kwargs):
        return self.particulator.formulae.optical_albedo.albedo(optical_depth)

    def shape_for_output(self, result):
        import numpy as np

        return np.asarray(result).shape


class CloudOpticalDepth(Product):
    """cloud optical depth from liquid water path and effective radius
    (reference ``cloud_optical_depth.py``; requires the ``optical_depth``
    formulae family, e.g. Stephens1978)"""

    def __init__(self, *, name=None, unit="dimensionless"):
        super().__init__(name=name or "cloud optical depth", unit=unit)

    def _impl(self, *, liquid_water_path, effective_radius, **kwargs):
        return self.particulator.formulae.optical_depth.tau(
            liquid_water_path, effective_radius
        )

    def shape_for_output(self, result):
        import numpy as np

        return np.asarray(result).shape
