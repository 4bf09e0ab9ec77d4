"""dynamics (process operators); parity: reference PySDM/dynamics/"""
from .collisions.collision import Collision, Coalescence, Breakup
from .ambient_thermodynamics import AmbientThermodynamics
from .condensation import Condensation
