"""test-side shim: make tools/ importable (the parity-trace test reuses
the generator's builder functions so test and artifact can never drift)"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tools",
    ),
)
