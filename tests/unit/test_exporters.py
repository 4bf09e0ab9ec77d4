"""Exporter round-trip tests (reference analogue:
``tests/smoke_tests/kinematic_2d/arabas_et_al_2015/test_export.py``)."""

import os

import numpy as np
from scipy.io import netcdf_file

from pysdm_tpu import Builder, Formulae
from pysdm_tpu.backends import CPU
from pysdm_tpu.environments import Box
from pysdm_tpu.dynamics import Coalescence
from pysdm_tpu.dynamics.collisions.collision_kernels import Golovin
from pysdm_tpu.exporters import NetCDFExporter, VTKExporter
from pysdm_tpu.products import TotalParticleConcentration, WaterMixingRatio
from pysdm_tpu.physics import si


def make_sim():
    n_sd = 64
    formulae = Formulae(seed=2)
    builder = Builder(n_sd=n_sd, backend=CPU(formulae),
                      environment=Box(dt=1 * si.s, dv=1e6 * si.m**3))
    builder.add_dynamic(Coalescence(collision_kernel=Golovin(b=1500), adaptive=False))
    rng = np.random.default_rng(2)
    attributes = {
        "multiplicity": np.full(n_sd, 1e10),
        "volume": rng.uniform(0.5, 2, n_sd) * (20 * si.um) ** 3,
    }
    return builder.build(attributes, products=(TotalParticleConcentration(),))


def test_netcdf_roundtrip(tmp_path):
    p = make_sim()
    output = {"total particle concentration": []}
    times = []
    for step in range(3):
        p.run(1)
        output["total particle concentration"].append(
            p.products["total particle concentration"].get()
        )
        times.append(p.n_steps * p.dt)
    path = str(tmp_path / "out.nc")
    NetCDFExporter(filename=path, particulator=p,
                   settings_attrs={"n_sd": 64}).run(output, times=times)
    with netcdf_file(path, "r") as f:
        assert f.n_sd == 64
        data = np.asarray(f.variables["total_particle_concentration"][:])
        assert data.shape[0] == 3
        np.testing.assert_allclose(
            data.ravel(),
            np.asarray(output["total particle concentration"], dtype=np.float32).ravel(),
        )


def test_vtk_export(tmp_path):
    p = make_sim()
    p.run(1)
    exporter = VTKExporter(path=str(tmp_path))
    exporter.export_attributes(p)
    exporter.export_products(p)
    files = sorted(os.listdir(tmp_path))
    assert any(f.startswith("sd_attributes") for f in files)
    assert any(f.startswith("sd_products") for f in files)
    content = open(tmp_path / files[0], encoding="utf-8").read()
    assert content.startswith("# vtk DataFile Version 3.0")
    assert "multiplicity" in content
