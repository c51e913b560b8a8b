"""3D (tetrahedral) discretization: exact Couette flow in a cube.

u = (y, 0, 0) with constant pressure solves Navier-Stokes exactly and lies
in the P2 space, so the 3D elements/assembly/BC/solve path must reproduce
it to machine precision.
"""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.solvers import StationarySolver


def shear_field(x):
    return np.stack([x[:, 1], np.zeros(len(x)), np.zeros(len(x))], axis=1)


def test_3d_couette_exact():
    mesh, markers = hyper_cube(3, 3)
    solver = StationarySolver(mesh, markers)
    bcs = tuple((VelocityBCType.function, face.value, shear_field)
                for face in (M.left, M.right, M.bottom, M.top, M.back,
                             M.front))
    solver.set_boundary_conditions(bcs)
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 0.5, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None, "body_force_term": None})
    solver.solve()
    u, p = solver.space.split(solver.solution)
    err = solver.operator.l2_error_velocity(u, shear_field)
    assert err < 1e-11, err
    assert solver.operator.divergence_l2(u) < 1e-11
    # pressure constant (pinned to 0)
    assert float(jnp.abs(p).max()) < 1e-9


def test_3d_cavity_converges():
    mesh, markers = hyper_cube(3, 4)
    solver = StationarySolver(mesh, markers)
    bcs = [(VelocityBCType.no_slip, face.value, None)
           for face in (M.left, M.right, M.bottom, M.back, M.front)]
    bcs.append((VelocityBCType.constant, M.top.value, (1.0, 0.0, 0.0)))
    solver.set_boundary_conditions(tuple(bcs))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 0.1, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None, "body_force_term": None})
    solver.solve()
    u, _ = solver.space.split(solver.solution)
    assert np.isclose(float(jnp.abs(u[:, 0]).max()), 1.0)
    assert bool(jnp.all(jnp.isfinite(u)))
