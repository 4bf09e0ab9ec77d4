"""0D box environment (parity: reference ``PySDM/environments/box.py``):
no thermodynamics, a plain mapping of ambient scalars plus a cell volume."""

import numpy as np

from ..impl.mesh import Mesh


class Box:
    def __init__(self, dt, dv):
        self.dt = dt
        self.dv = dv
        self.particulator = None
        self._ambient = {}

    def register(self, builder):
        self.particulator = builder.particulator
        builder.particulator.environment = self
        builder.particulator.mesh = Mesh.mesh_0d(self.dv)
        builder.particulator.dt = self.dt

    def __getitem__(self, key):
        return self._ambient[key]

    def __setitem__(self, key, value):
        self._ambient[key] = np.asarray(value)

    def __contains__(self, key):
        return key in self._ambient

    def init_env_state(self, dtype):
        """functional env state entering the jitted step (none for Box)"""
        return {}

    def sync(self):
        pass
