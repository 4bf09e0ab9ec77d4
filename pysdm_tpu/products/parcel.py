"""Parcel-environment products (parity: reference ``PySDM/products/parcel/``)."""

import numpy as np

from .impl import MomentProduct, Product


class ParcelDisplacement(Product):
    """parcel altitude z (reference ``parcel_displacement.py``)"""

    def __init__(self, name=None, unit="m"):
        super().__init__(name=name or "parcel displacement", unit=unit)

    def register(self, builder):
        super().register(builder)
        from ..environments import Parcel

        assert isinstance(self.particulator.environment, Parcel)

    def _impl(self, **kwargs):
        return np.asarray(self.particulator.get_env("z"))


class ParcelLiquidWaterPath(MomentProduct):
    """cloud water path integrated over parcel displacement, trapezoidal in z
    (reference ``cloud_water_path.py``); as products are pulled between run()
    chunks, integration granularity equals the observation cadence"""

    def __init__(self, *, count_unactivated, count_activated, name=None,
                 unit="kg/m^2"):
        super().__init__(name=name or "parcel liquid water path", unit=unit)
        self.act_filter_range = [0.0, np.inf]
        if not count_activated:
            self.act_filter_range[1] = 1.0
        if not count_unactivated:
            self.act_filter_range[0] = 1.0
        self.previous = {"z": 0.0, "cwc": 0.0}
        self.cwp = 0.0

    def register(self, builder):
        super().register(builder)
        from ..environments import Parcel

        assert isinstance(self.particulator.environment, Parcel)
        if hasattr(self.particulator, "observers"):
            self.particulator.observers.append(self)

    def notify(self):
        _, mass = self._download_moment(
            attr="water mass",
            rank=1,
            filter_attr="wet to critical volume ratio",
            filter_range=tuple(self.act_filter_range),
            skip_division_by_m0=True,
        )
        cwc = np.asarray(mass) / self.particulator.mesh.dv
        current_z = np.asarray(self.particulator.get_env("z"))
        dz = current_z - self.previous["z"]
        cwc_mean = (cwc + self.previous["cwc"]) / 2
        if np.any(self.previous["cwc"] > 0):
            self.cwp = self.cwp + cwc_mean * dz
        self.previous["z"] = current_z
        self.previous["cwc"] = cwc

    def _impl(self, **kwargs):
        return np.asarray(self.cwp)
