"""0D box environment (parity: reference ``PySDM/environments/box.py``):
no thermodynamics, a plain mapping of ambient scalar fields plus a cell
volume. Ambient fields set before build enter the traced env state (so e.g.
box freezing tests can prescribe T/RH); fields set after build update the
state in place between steps."""

import jax.numpy as jnp
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
        if (
            self.particulator is not None
            and self.particulator.sim_state
            and key in self.particulator.sim_state["env"]
        ):
            return np.asarray(self.particulator.sim_state["env"][key])
        return self._ambient[key]

    def __setitem__(self, key, value):
        self._ambient[key] = np.asarray(value)
        if self.particulator is not None and self.particulator.sim_state:
            dtype = self.particulator.dtype
            self.particulator.sim_state["env"][key] = jnp.atleast_1d(
                jnp.asarray(value, dtype=dtype)
            )

    def __contains__(self, key):
        return key in self._ambient

    def init_env_state(self, dtype):
        """ambient fields prescribed pre-build become traced state"""
        return {
            k: jnp.atleast_1d(jnp.asarray(v, dtype=dtype))
            for k, v in self._ambient.items()
        }

    def sync(self):
        pass
