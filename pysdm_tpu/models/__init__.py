"""ready-made simulation configurations (the reference's examples layer):
box coalescence, adiabatic parcel, 1D column, 2D kinematic warm rain"""
from . import arabas_et_al_2015
