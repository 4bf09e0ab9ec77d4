"""Meta-tests (reference analogue:
``tests/examples_tests/test_tests_completeness.py``): every app-layer model
module must be exercised by at least one test, and every dynamic exported by
the package must have a test referencing it."""

import pathlib
import re

import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]
MODELS = REPO / "pysdm_tpu" / "models"
TESTS = pathlib.Path(__file__).resolve().parents[1]


def _all_test_text():
    return "\n".join(
        p.read_text() for p in TESTS.rglob("test_*.py")
    )


def test_every_model_module_has_a_test():
    tests_text = _all_test_text()
    missing = []
    for mod in sorted(MODELS.glob("*.py")):
        name = mod.stem
        if name == "__init__":
            continue
        if name not in tests_text:
            missing.append(name)
    assert not missing, f"model modules with no test reference: {missing}"


def test_every_dynamic_has_a_test():
    import pysdm_tpu.dynamics as dyn

    tests_text = _all_test_text()
    missing = [
        name
        for name in dir(dyn)
        if re.match(r"^[A-Z]", name) and name not in tests_text
    ]
    assert not missing, f"dynamics with no test reference: {missing}"
