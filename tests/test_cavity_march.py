"""Cavity march helpers: lattice resampling + the banded pseudo-time march.

The Re=1000 contract chain itself (march -> PTC -> Newton -> refined,
reference ns_solver_base.py:938-988) runs in benchmarks/cavity_re1000.py;
here we pin down the pieces cheap enough for CI."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "benchmarks"))

from cavity_re1000 import interp_cavity_state, march_to_steady  # noqa: E402

from navierstokes_tpu.fem.spaces import TaylorHoodSpace  # noqa: E402
from navierstokes_tpu.mesh import hyper_cube  # noqa: E402


def test_interp_cavity_state_reproduces_affine_fields():
    s1 = TaylorHoodSpace(hyper_cube(2, 6)[0])
    s2 = TaylorHoodSpace(hyper_cube(2, 10)[0])
    cu, cp = s1.u_coords, s1.p_coords
    u1 = np.stack([1.0 + 2.0 * cu[:, 0] - cu[:, 1],
                   -0.5 + cu[:, 0] + 3.0 * cu[:, 1]], axis=1)
    p1 = 4.0 - 2.0 * cp[:, 0] + cp[:, 1]
    x1 = np.concatenate([u1.reshape(-1), p1])
    x2 = interp_cavity_state(s1, x1, 6, s2, 10)
    cu2, cp2 = s2.u_coords, s2.p_coords
    u2_expect = np.stack([1.0 + 2.0 * cu2[:, 0] - cu2[:, 1],
                          -0.5 + cu2[:, 0] + 3.0 * cu2[:, 1]], axis=1)
    p2_expect = 4.0 - 2.0 * cp2[:, 0] + cp2[:, 1]
    np.testing.assert_allclose(
        x2[:s2.n_velocity_dofs].reshape(-1, 2), u2_expect, atol=1e-12)
    np.testing.assert_allclose(
        x2[s2.n_velocity_dofs:], p2_expect, atol=1e-12)


def test_march_to_steady_smoke():
    x, info = march_to_steady(8, re_target=50.0, t_max=3.0,
                              settle_tol=1e-12)
    assert np.isfinite(x).all()
    space = TaylorHoodSpace(hyper_cube(2, 8)[0])
    u = x[:space.n_velocity_dofs].reshape(-1, 2)
    coords = space.u_coords
    lid = np.abs(coords[:, 1] - 1.0) < 1e-12
    interior_lid = lid & (coords[:, 0] > 1e-12) & (coords[:, 0] < 1 - 1e-12)
    np.testing.assert_allclose(u[interior_lid, 0], 1.0, atol=1e-6)
    walls = (np.abs(coords[:, 1]) < 1e-12) | (np.abs(coords[:, 0]) < 1e-12) \
        | (np.abs(coords[:, 0] - 1.0) < 1e-12)
    np.testing.assert_allclose(u[walls & ~lid], 0.0, atol=1e-6)
    # the lid drags fluid: u_min on the centerline is negative by now
    assert info["u_min"] < -0.05
