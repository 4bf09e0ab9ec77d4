"""dynamics (process operators); parity: reference PySDM/dynamics/"""
from .collisions.collision import Collision, Coalescence, Breakup
