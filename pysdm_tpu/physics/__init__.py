"""Physics layer: unit helpers, constants catalogue, formula-variant families,
and the Formulae binding engine."""

from .si import si, in_unit, convert_to
from .constants import make_constants, DEFAULTS as constant_defaults
from .formulae import Formulae

# commonly used module-level constants for parity with `PySDM.physics import constants`
from .si import (  # noqa: F401
    PI,
    PI_4_3,
    T0,
    PPM,
    PPB,
    PPT,
    PER_CENT,
    PER_MILLE,
    PER_MEG,
)
