"""dynamics (process operators); parity: reference PySDM/dynamics/"""
from .collisions.collision import Collision, Coalescence, Breakup
from .ambient_thermodynamics import AmbientThermodynamics
from .condensation import Condensation
from .displacement import Displacement
from .eulerian_advection import EulerianAdvection
