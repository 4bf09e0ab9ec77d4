"""initialisation: spectra, sampling, multiplicity discretisation"""
from . import spectra
from .discretise_multiplicities import discretise_multiplicities
