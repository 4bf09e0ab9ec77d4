"""internal implementation helpers: mesh, particle state, attribute resolution"""
from .mesh import Mesh
from .state import ParticleState, make_particle_state
from .attributes import AttributeResolver
