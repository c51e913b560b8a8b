#!/usr/bin/env python3
"""Regenerate the frozen golden fields (run from the repo root).

Each case is solved TWICE and the two solutions compared: the golden is
only written if the case reproduces itself to < 1e-12 (determinism
check), so the committed tolerance (1e-8, tests/test_goldens.py) has
four orders of margin for BLAS/platform variation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tests"))

import conftest  # noqa: F401  (forces CPU f64 backend)
import numpy as np

from goldens.cases import CASES


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for name, fn in CASES.items():
        x1, desc = fn()
        x2, _ = fn()
        rep = np.linalg.norm(x1 - x2) / max(np.linalg.norm(x1), 1e-30)
        assert rep < 1e-12, (name, rep)
        out = os.path.join(here, f"{name}.npz")
        np.savez_compressed(out, x=x1, description=desc)
        print(f"{name}: {desc} -> {out} ({len(x1)} dofs, "
              f"|x|={np.linalg.norm(x1):.6e}, self-reproduction {rep:.1e})")


if __name__ == "__main__":
    main()
