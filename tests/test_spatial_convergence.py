"""Spatial h-convergence of the Taylor-Hood discretization.

Manufactured steady solution: the Taylor-Green field satisfies
(u . grad)u + grad p = 0, so with body force f = -nu lap(u) = 2 gamma^2 nu u
the pair (u_TG, p_TG) solves the steady Navier-Stokes equations exactly.
P2/P1 optimal rates: L2(u) ~ h^3, L2(p) ~ h^2.
"""

import math

import numpy as np

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.solvers import StationarySolver

GAMMA = 2.0 * np.pi
NU = 0.1


def u_exact(x):
    return np.stack([np.cos(GAMMA * x[:, 0]) * np.sin(GAMMA * x[:, 1]),
                     -np.sin(GAMMA * x[:, 0]) * np.cos(GAMMA * x[:, 1])],
                    axis=1)


def p_exact(x):
    return -0.25 * (np.cos(2 * GAMMA * x[:, 0]) + np.cos(2 * GAMMA * x[:, 1]))


def body_force(x):
    return 2.0 * GAMMA ** 2 * NU * u_exact(x)


def solve_on(n):
    mesh, markers = hyper_cube(2, n)
    solver = StationarySolver(mesh, markers, tol=1e-12)
    solver.set_boundary_conditions(
        tuple((VelocityBCType.function, face.value, u_exact)
              for face in (M.left, M.right, M.bottom, M.top)))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": NU, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None,
         "body_force_term": 1.0})
    solver.set_body_force(body_force)
    solver.solve()
    u, p = solver.space.split(solver.solution)
    # remove the pressure constant before comparing
    p = p - solver.operator.mean_pressure(p)
    err_u = solver.operator.l2_error_velocity(u, u_exact)
    err_p = solver.operator.l2_error_pressure(p, p_exact)
    return err_u, err_p


def test_taylor_hood_spatial_orders():
    errors = [solve_on(n) for n in (8, 16, 32)]
    orders_u = [math.log2(errors[i][0] / errors[i + 1][0])
                for i in range(2)]
    orders_p = [math.log2(errors[i][1] / errors[i + 1][1])
                for i in range(2)]
    # optimal: 3 for P2 velocity, 2 for P1 pressure
    assert orders_u[-1] > 2.7, (errors, orders_u)
    assert orders_p[-1] > 1.7, (errors, orders_p)
