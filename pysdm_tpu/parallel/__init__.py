"""multi-device distribution layer (absent in the single-device reference —
SURVEY.md §2.5): halo exchange, particle migration, x-slab-decomposed 2D
simulation over a jax device mesh"""
from . import halo, migration
from .distributed_2d import DistributedSimulation2D
