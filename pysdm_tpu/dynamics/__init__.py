"""dynamics (process operators); parity: reference PySDM/dynamics/"""
from .collisions.collision import Collision, Coalescence, Breakup
from .ambient_thermodynamics import AmbientThermodynamics
from .condensation import Condensation
from .displacement import Displacement
from .eulerian_advection import EulerianAdvection
from .freezing import Freezing
from .vapour_deposition_on_ice import VapourDepositionOnIce
from .seeding import Seeding
from .relaxed_velocity import RelaxedVelocity
from .aqueous_chemistry import AqueousChemistry
from .isotopic_fractionation import IsotopicFractionation
