"""Golden-field regression pack: every CI run re-solves four canonical
cases and must reproduce the frozen f64 fields to L2 <= 1e-8.

This is the closest realizable stand-in for BASELINE.md's "stationary L2
agreement with FEniCS to 1e-8" (FEniCS cannot be installed here): the
fields in tests/goldens/*.npz were frozen from converged f64 solves that
reproduce themselves to < 1e-12 (see goldens/generate.py), so any drift
beyond 1e-8 signals a real numeric change, not noise.  Reference parity:
/root/reference/tests/test_stationary_solvers.py:259-261.
"""

import os

import numpy as np
import pytest

from goldens.cases import CASES

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_reproduction(name):
    data = np.load(os.path.join(HERE, "goldens", f"{name}.npz"),
                   allow_pickle=True)
    golden = np.asarray(data["x"], np.float64)
    x, desc = CASES[name]()
    assert x.shape == golden.shape, (name, x.shape, golden.shape)
    rel = np.linalg.norm(x - golden) / np.linalg.norm(golden)
    assert rel < 1e-8, (name, str(data["description"]), rel)
