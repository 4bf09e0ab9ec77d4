"""SI unit helpers.

A zero-cost stand-in for a units package: every unit is a plain float holding its
magnitude in SI base units, so ``5 * si.um`` is just ``5e-6``. This mirrors the
behaviour of the reference's fake unit registry (see reference
``PySDM/physics/impl/fake_unit_registry.py``) without carrying a pint dependency
into jitted code. Dimensional correctness is exercised in unit tests against
known physical values instead of via runtime unit tracking.
"""

import numpy as np


class _SI:
    """attribute access returns the SI magnitude of the unit (float)"""

    # length
    metre = metres = meter = meters = m = 1.0
    kilometre = kilometres = km = 1e3
    centimetre = centimetres = cm = 1e-2
    millimetre = millimetres = mm = 1e-3
    micrometre = micrometres = micron = um = 1e-6
    nanometre = nanometres = nm = 1e-9

    # mass
    kilogram = kilograms = kg = 1.0
    gram = grams = g = 1e-3
    milligram = milligrams = mg = 1e-6
    microgram = micrograms = ug = 1e-9
    nanogram = nanograms = ng = 1e-12

    # time
    second = seconds = s = 1.0
    millisecond = milliseconds = ms = 1e-3
    microsecond = microseconds = us = 1e-6
    hertz = Hz = 1.0
    minute = minutes = min = 60.0
    hour = hours = h = 3600.0
    day = days = 86400.0

    # temperature
    kelvin = kelvins = K = 1.0

    # amount
    mole = moles = mol = 1.0
    millimole = mmol = 1e-3
    micromole = umol = 1e-6

    # derived
    newton = newtons = N = 1.0
    millinewton = mN = 1e-3
    joule = joules = J = 1.0
    watt = watts = W = 1.0
    pascal = pascals = Pa = 1.0
    hectopascal = hectopascals = hPa = 100.0
    kilopascal = kPa = 1e3
    bar = 1e5
    millibar = mbar = 100.0
    litre = litres = liter = liters = L = l = 1e-3
    dimensionless = 1.0

    def __getattr__(self, name):  # pragma: no cover - defensive
        raise AttributeError(f"unknown unit: {name}")


si = _SI()

# commonly-used dimensionless helpers (reference PySDM/physics/constants.py:33-69)
sqrt_two = np.sqrt(2.0)
sqrt_pi = np.sqrt(np.pi)
PI = np.pi
PI_4_3 = np.pi * 4.0 / 3.0
LN_2 = np.log(2.0)
ONE_THIRD = 1.0 / 3.0
ONE_HALF = 0.5
TWO_THIRDS = 2.0 / 3.0
ONE_AND_A_HALF = 1.5
TWO_AND_A_HALF = 2.5
ZERO = 0.0
ONE = 1.0
TWO = 2.0
THREE = 3.0
FOUR = 4.0
TWELVE = 12.0

PPT = 1e-12
PPB = 1e-9
PPM = 1e-6
PER_CENT = 1e-2
PER_MILLE = 1e-3
PER_MEG = PPM

T0 = 273.15  # zero Celsius in K
M = si.mole / si.litre  # mol/litre in SI (mol/m^3)
K_H2O = 1e-14 * M * M

CM = 1.0 * si.cm
UM = 1.0 * si.um


def in_unit(value, unit):
    return value / unit


def convert_to(value, unit):
    value /= unit
    return value
