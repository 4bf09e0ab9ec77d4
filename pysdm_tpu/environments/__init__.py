"""environments (parity: reference PySDM/environments/)"""
from .box import Box
from .parcel import Parcel
from .kinematic_1d import Kinematic1D
from .kinematic_2d import Kinematic2D
