"""Structured mesh descriptor (parity: reference ``PySDM/impl/mesh.py``).

Static (host-side) metadata: grid shape, strides for
``cell_id = dot(strides, cell_origin)``, cell volume. Used at trace time —
all fields are plain Python numbers / numpy arrays, never traced.
"""

import numpy as np


class Mesh:
    def __init__(self, grid, size):
        self.grid = tuple(grid)
        self.size = tuple(size)
        self.strides = Mesh.__strides(self.grid)
        self.n_cell = int(np.prod(self.grid))
        self.dv = float(np.prod((np.asarray(size) / np.asarray(grid))))
        self.dimension = len(self.grid)
        self.dz = (
            self.size[-1] / self.grid[-1] if self.dimension > 0 else np.nan
        )

    @property
    def n_dims(self):
        return self.dimension

    @staticmethod
    def mesh_0d(dv=None):
        mesh = Mesh.__new__(Mesh)
        mesh.grid = (1,)
        mesh.size = (np.nan,)
        mesh.strides = np.array([[1]], dtype=np.int64)
        mesh.n_cell = 1
        mesh.dv = dv
        mesh.dimension = 0
        mesh.dz = np.nan
        return mesh

    @staticmethod
    def __strides(grid):
        """row-major strides: e.g. grid (nx, nz) -> [nz, 1]"""
        domain = np.empty(tuple(grid))
        strides = np.array(domain.strides).reshape(1, -1) // domain.itemsize
        return strides.astype(np.int64)

    def cellular_attributes(self, positions):
        """dimensionless positions (n_dims, n_sd) in grid coordinates ->
        (cell_id, cell_origin, position_in_cell); reference impl/mesh.py:62-87"""
        n_sd = positions.shape[1]
        cell_origin = np.floor(positions).astype(np.int64)
        position_in_cell = positions - cell_origin
        cell_id = np.dot(self.strides, cell_origin).ravel().astype(np.int64)
        assert cell_id.shape == (n_sd,)
        return cell_id, cell_origin, position_in_cell
