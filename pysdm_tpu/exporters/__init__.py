"""exporters (netCDF / VTK); parity: reference PySDM/exporters/"""
