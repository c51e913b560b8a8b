"""Rotating-frame flows (Coriolis/Euler terms) in a 2D annulus.

Mirrors the reference's tests/test_stationary_rotating_flow.py and
tests/test_instationary_rotating_flow.py, upgraded with an assertion
against the analytic rotating-frame Couette profile u_theta = A r + B / r
(the reference carries the expression but never asserts it).
"""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import (SphericalAnnulusBoundaryMarkers,
                                   spherical_shell)
from navierstokes_tpu.problems import (AngularVelocityVector,
                                       EquationCoefficientHandler,
                                       FunctionTime, InstationaryProblem,
                                       StationaryProblem)
from navierstokes_tpu.solvers import ImplicitBDFSolver

B = SphericalAnnulusBoundaryMarkers


class ConstantRate(FunctionTime):
    def __init__(self):
        super().__init__(1)

    def value(self):
        return 1.0


class SpinUpRate(FunctionTime):
    """omega(t) = tanh(t) with an implemented derivative (Euler term)."""

    def __init__(self):
        super().__init__(1)

    def value(self):
        return float(np.tanh(self.current_time))

    def derivative(self):
        return float(1.0 - np.tanh(self.current_time) ** 2)


def couette_exact(ri, ro):
    """u_theta = A r + B/r with u_theta(ri) = -ri, u_theta(ro) = 0."""
    M = np.array([[ri, 1.0 / ri], [ro, 1.0 / ro]])
    A, Bc = np.linalg.solve(M, np.array([-ri, 0.0]))

    def exact(x):
        r = np.hypot(x[:, 0], x[:, 1])
        ut = A * r + Bc / r
        # theta-hat = (-y, x)/r
        return np.stack([-x[:, 1] / r * ut, x[:, 0] / r * ut], axis=1)

    return exact


class RotatingCouetteFlow(StationaryProblem):
    def __init__(self, n_points, radii):
        super().__init__()
        self._write_output = False
        self._radii = radii
        self._n_points = n_points
        self._problem_name = "RotationalCouette"

    def setup_mesh(self):
        self._mesh, self._boundary_markers = spherical_shell(
            2, self._radii, self._n_points)

    def set_angular_velocity(self):
        self._angular_velocity = AngularVelocityVector(
            2, function=ConstantRate())

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=1000.0,
                                                               Ro=1.0)

    def set_boundary_conditions(self):
        inner_velocity = lambda x: np.stack([x[:, 1], -x[:, 0]], axis=1)
        self._bcs = ((VelocityBCType.no_slip, B.exterior_boundary.value,
                      None),
                     (VelocityBCType.function, B.interior_boundary.value,
                      inner_velocity))


class TransientRotatingFlow(InstationaryProblem):
    def __init__(self, n_points, radii):
        super().__init__(start_time=0.0, end_time=1.0,
                         desired_start_time_step=0.02, n_max_steps=5)
        self._write_output = False
        self._radii = radii
        self._n_points = n_points
        self._problem_name = "TransientRotating"
        self.set_solver_class(ImplicitBDFSolver)

    def setup_mesh(self):
        self._mesh, self._boundary_markers = spherical_shell(
            2, self._radii, self._n_points)

    def set_angular_velocity(self):
        self._angular_velocity = AngularVelocityVector(
            2, function=SpinUpRate())

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=200.0,
                                                               Ro=1.0)

    def set_initial_conditions(self):
        self._initial_conditions = {"velocity": (0.0, 0.0)}

    def set_boundary_conditions(self):
        inner_velocity = lambda x, t: np.tanh(t) * np.stack(
            [x[:, 1], -x[:, 0]], axis=1)
        self._bcs = ((VelocityBCType.no_slip, B.exterior_boundary.value,
                      None),
                     (VelocityBCType.function, B.interior_boundary.value,
                      inner_velocity))


def test_stationary_rotating_couette():
    ri, ro = 0.25, 1.0
    problem = RotatingCouetteFlow(40, (ri, ro))
    problem.solve_problem()
    solver = problem._get_solver()
    u, _ = solver.space.split(solver.solution)
    exact = couette_exact(ri, ro)
    err = solver.operator.l2_error_velocity(u, exact)
    norm = solver.operator.l2_error_velocity(jnp.zeros_like(u), exact)
    assert err / norm < 0.05, (err, norm)


def test_transient_rotating_flow():
    problem = TransientRotatingFlow(24, (0.25, 1.0))
    problem.solve_problem()
    assert problem._time_stepping.step_number == 5
    u = problem._get_velocity()
    # spin-up from rest: bounded, nonzero motion near the inner boundary
    umax = float(jnp.abs(u).max())
    assert 0.0 < umax < 1.0
