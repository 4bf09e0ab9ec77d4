"""exporters (parity: reference PySDM/exporters/): netCDF via scipy,
self-contained legacy-VTK writers"""
from .netcdf_exporter import NetCDFExporter
from .vtk_exporter import VTKExporter
from .exporters_1d import NetCDFExporter_1D, VTKExporter_1D
