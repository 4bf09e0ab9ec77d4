"""IsotopicFractionation dynamic (parity: reference
``PySDM/dynamics/isotopic_fractionation.py``): resolves fractionation of
water isotopologues across condensation. NOTE: in the reference the backend
kernel is a stub on both CPU and GPU (``isotope_methods.py:28``,
SURVEY.md §2.3) — mirrored here: the dynamic validates its wiring (requires
Condensation registered before it, requests the mole-amount attributes) and
the per-step update is a no-op pending the upstream physics."""

LIGHT_ISOTOPES = ("1H", "16O")
HEAVY_ISOTOPES = ("2H", "3H", "17O", "18O")


class IsotopicFractionation:
    def __init__(self, isotopes: tuple = HEAVY_ISOTOPES):
        self.isotopes = isotopes
        self.particulator = None

    def register(self, builder):
        self.particulator = builder.particulator
        keys = list(self.particulator.dynamics.keys())
        if "Condensation" not in keys or keys.index("Condensation") > keys.index(
            "IsotopicFractionation"
        ):
            raise AssertionError(
                "Condensation needs to be registered to run prior to"
                " IsotopicFractionation"
            )
        for isotope in self.isotopes:
            builder.request_attribute(f"moles_{isotope}")

    def make_step(self, particulator):
        def step(sim):
            return sim  # reference-parity stub (see module docstring)

        return step
