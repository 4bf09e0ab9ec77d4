from . import collision_kernels
from .collision import Collision, Coalescence, Breakup
