"""environments (parity: reference PySDM/environments/)"""
from .box import Box
from .parcel import Parcel
