"""Transient end-to-end solves: monolithic BDF-2 via the Problem API.

Mirrors the reference's tests/test_transient_solvers.py (time-dependent
channel inflow, transient gravity-driven flow, doubly periodic
Taylor-Green with the mean-pressure constraint), upgraded with L2-error
assertions against the analytic Taylor-Green decay.
"""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
from navierstokes_tpu.fem.spaces import axis_periodic
from navierstokes_tpu.mesh import (HyperCubeBoundaryMarkers, hyper_cube,
                                   hyper_rectangle, open_hyper_cube)
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       InstationaryProblem)
from navierstokes_tpu.solvers import ImplicitBDFSolver

M = HyperCubeBoundaryMarkers

GAMMA = 2.0 * np.pi


def taylor_green_velocity(x, t, Re=100.0):
    decay = np.exp(-2.0 * GAMMA ** 2 * t / Re)
    return decay * np.stack([
        np.cos(GAMMA * x[:, 0]) * np.sin(GAMMA * x[:, 1]),
        -np.sin(GAMMA * x[:, 0]) * np.cos(GAMMA * x[:, 1])], axis=1)


def taylor_green_pressure(x, t, Re=100.0):
    decay = np.exp(-4.0 * GAMMA ** 2 * t / Re)
    return -0.25 * decay * (np.cos(2 * GAMMA * x[:, 0])
                            + np.cos(2 * GAMMA * x[:, 1]))


class ChannelFlowProblem(InstationaryProblem):
    def __init__(self, n_points):
        super().__init__(start_time=0.0, end_time=1.0,
                         desired_start_time_step=0.01, n_max_steps=10)
        self._write_output = False
        self._n_points = n_points
        self._problem_name = "ChannelFlow"
        self._output_frequency = 0
        self._postprocessing_frequency = 10
        self.set_solver_class(ImplicitBDFSolver)

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_rectangle(
            (0.0, 0.0), (10.0, 1.0), (10 * self._n_points, self._n_points))

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=10.0)

    def set_initial_conditions(self):
        self._initial_conditions = {"velocity": (0.0, 0.0)}

    def set_boundary_conditions(self):
        def inlet(x, t):
            amp = 1.0 + 0.5 * np.sin(np.pi * t)
            return np.stack([6.0 * x[:, 1] * (1.0 - x[:, 1]) * amp,
                             np.zeros(len(x))], axis=1)

        self._bcs = ((VelocityBCType.function, M.left.value, inlet),
                     (VelocityBCType.no_slip, M.bottom.value, None),
                     (VelocityBCType.no_slip, M.top.value, None))

    def postprocess_solution(self):
        self._add_to_field_output(self._compute_pressure_gradient())
        self._add_to_field_output(self._compute_vorticity())


class GravityDrivenFlowProblem(InstationaryProblem):
    def __init__(self, n_points):
        super().__init__(start_time=0.0, end_time=1.0,
                         desired_start_time_step=0.01, n_max_steps=10)
        self._write_output = False
        self._n_points = n_points
        self._problem_name = "OpenCubeTransient"
        self._output_frequency = 0
        self._postprocessing_frequency = 10
        self.set_solver_class(ImplicitBDFSolver)

    def setup_mesh(self):
        openings = (("bottom", (0.4, 0.0), 0.4),
                    ("left", (0.0, 0.5), 0.1),
                    ("right", (1.0, 0.7), 0.1),
                    ("top", (0.5, 1.0), 0.8))
        self._mesh, self._boundary_markers = open_hyper_cube(
            2, self._n_points, openings)

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=100.0,
                                                               Fr=1.0)

    def set_initial_conditions(self):
        self._initial_conditions = {"velocity": (0.0, 0.0)}

    def set_boundary_conditions(self):
        self._bcs = ((VelocityBCType.no_slip, M.left.value, None),
                     (VelocityBCType.no_slip, M.right.value, None),
                     (VelocityBCType.no_slip, M.bottom.value, None),
                     (VelocityBCType.no_slip, M.top.value, None))

    def set_body_force(self):
        self._body_force = (0.0, -1.0)


class TaylorGreenVortex(InstationaryProblem):
    def __init__(self, n_points=16, dt=0.1, n_max_steps=10):
        super().__init__(start_time=0.0, end_time=1.0,
                         desired_start_time_step=dt,
                         n_max_steps=n_max_steps)
        self._write_output = False
        self._n_points = n_points
        self._problem_name = "TaylorGreenVortex"
        self._output_frequency = 0
        self._postprocessing_frequency = 0
        self.set_solver_class(ImplicitBDFSolver)

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_cube(2, self._n_points)

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=100.0)

    def set_initial_conditions(self):
        self._initial_conditions = {
            "velocity": lambda x: taylor_green_velocity(x, 0.0),
            "pressure": lambda x: taylor_green_pressure(x, 0.0),
        }

    def set_boundary_conditions(self):
        self._bcs = ((PressureBCType.mean_value, None, 0.0),)

    def set_periodic_boundary_conditions(self):
        self._periodic_bcs = [axis_periodic(0), axis_periodic(1)]
        self._periodic_boundary_ids = (M.left.value, M.right.value,
                                       M.top.value, M.bottom.value)


def test_channel_flow():
    problem = ChannelFlowProblem(5)
    problem.solve_problem()
    ts = problem._time_stepping
    assert ts.step_number == 10
    assert np.isclose(ts.current_time, 0.1)
    u = problem._get_velocity()
    # inlet amplitude at t=0.1 reproduced at the inlet midpoint
    space = problem._get_solver().space
    mid_inlet = (np.abs(space.u_coords[:, 0]) < 1e-12) \
        & (np.abs(space.u_coords[:, 1] - 0.5) < 1e-12)
    expected = 1.5 * (1.0 + 0.5 * np.sin(np.pi * 0.1))
    assert np.isclose(float(np.asarray(u)[mid_inlet, 0][0]), expected)


def test_transient_gravity_driven_flow():
    problem = GravityDrivenFlowProblem(32)
    problem.solve_problem()
    u = problem._get_velocity()
    # gravity accelerates a downward flow through the bottom opening
    assert float(jnp.min(u[:, 1])) < 0.0
    assert problem._time_stepping.step_number == 10


def test_taylor_green_vortex():
    problem = TaylorGreenVortex()
    problem.solve_problem()
    ts = problem._time_stepping
    assert np.isclose(ts.current_time, 1.0)
    solver = problem._get_solver()
    u, p = solver.space.split(solver.solution)
    op = solver.operator
    err_u = op.l2_error_velocity(u, lambda x: taylor_green_velocity(x, 1.0))
    err_p = op.l2_error_pressure(p, lambda x: taylor_green_pressure(x, 1.0))
    # 16^2 mesh, dt=0.1: dominated by temporal error; conservative bounds
    assert err_u < 5e-3, err_u
    assert err_p < 2e-2, err_p
    # mean-pressure constraint enforced
    assert abs(float(op.mean_pressure(p))) < 1e-10


def test_adaptive_time_stepping_limits_cfl():
    """With _adaptive_time_stepping=True the CFL limiter shrinks the step
    (the reference's limiter is a silent no-op in its default config,
    ns_problem.py:599-603)."""
    problem = ChannelFlowProblem(4)
    problem._adaptive_time_stepping = True
    problem._desired_start_time_step = 0.5   # CFL >> 1 initially
    problem._n_max_steps = 3
    problem.solve_problem()
    ts = problem._time_stepping
    # the limiter reduced the step below the desired 0.5
    assert ts.get_previous_step_size() < 0.5


def test_time_dependent_body_force_and_bcs():
    """Manufactured solution u = (t sin(pi y), 0), p = 0: linear in time,
    so BDF integrates it exactly and only the spatial error remains.
    Exercises the time-dependent body-force and Dirichlet-value paths
    together."""
    from navierstokes_tpu.solvers import ImplicitBDFSolver
    from navierstokes_tpu.timestepping import BDFTimeStepping

    nu = 0.1

    def u_ex(x, t):
        return np.stack([t * np.sin(np.pi * x[:, 1]),
                         np.zeros(len(x))], axis=1)

    def force(x, t):
        f = np.sin(np.pi * x[:, 1]) * (1.0 + nu * np.pi ** 2 * t)
        return np.stack([f, np.zeros(len(x))], axis=1)

    mesh, markers = hyper_cube(2, 16)
    ts = BDFTimeStepping(0.0, 1.0, desired_start_time_step=0.05)
    solver = ImplicitBDFSolver(mesh, markers, "standard", ts)
    solver.set_boundary_conditions(
        tuple((VelocityBCType.function, face.value, u_ex)
              for face in (M.left, M.right, M.bottom, M.top)))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": nu, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None,
         "body_force_term": 1.0})
    solver.set_body_force(force)
    solver.set_initial_conditions({"velocity": (0.0, 0.0)})
    for _ in range(6):
        ts.update_coefficients()
        solver.solve()
        ts.advance_time()
        solver.advance_time()
    u, _ = solver.space.split(solver.solution)
    t = ts.current_time
    err = solver.operator.l2_error_velocity(u, lambda x: u_ex(x, t))
    # linear-in-time: only the P2 interpolation error of sin(pi y) remains
    assert err < 2e-4, err


def test_frozen_lu_modified_newton(monkeypatch):
    """linear_solver="frozen_lu" reuses one factorization across Newton
    iterations AND steps, refreshes it when the lagged Jacobian stalls
    the contraction (here: a 10x step-size jump), and converges to the
    same solution as the per-iteration direct solve."""
    import navierstokes_tpu.linalg.direct as direct
    from navierstokes_tpu.timestepping import BDFTimeStepping

    n_fact = {"count": 0}
    real_lu = direct.HostSparseLU

    class CountingLU(real_lu):
        def __init__(self, csr):
            n_fact["count"] += 1
            super().__init__(csr)

    import navierstokes_tpu.solvers.stationary as stationary

    monkeypatch.setattr(direct, "HostSparseLU", CountingLU)
    monkeypatch.setattr(stationary, "HostSparseLU", CountingLU)

    mesh, markers = hyper_rectangle((0.0, 0.0), (4.0, 1.0), (12, 3))

    def inlet(x):
        return np.stack([6.0 * x[:, 1] * (1.0 - x[:, 1]),
                         np.zeros(len(x))], axis=1)

    def run(linear):
        n0 = n_fact["count"]
        ts = BDFTimeStepping(0.0, 1.0, desired_start_time_step=0.02)
        solver = ImplicitBDFSolver(mesh, markers, "standard", ts,
                                   tol=1e-10, linear_solver=linear)
        solver.set_boundary_conditions(
            ((VelocityBCType.function, M.left.value, inlet),
             (VelocityBCType.no_slip, M.bottom.value, None),
             (VelocityBCType.no_slip, M.top.value, None)))
        solver.set_equation_coefficients(
            {"convective_term": 1.0, "viscous_term": 0.1,
             "pressure_term": 1.0, "coriolis_term": None,
             "euler_term": None, "body_force_term": None})
        solver.set_initial_conditions({"velocity": (0.0, 0.0)})
        for step in range(6):
            if step == 4:   # abrupt dt jump: lagged Jacobian must refresh
                ts.set_desired_next_step_size(0.2)
            ts.update_coefficients()
            solver.solve()
            ts.advance_time()
            solver.advance_time()
        return np.asarray(solver.solution), n_fact["count"] - n0

    x_ref, fact_ref = run("host_lu")
    x_frozen, fact_frozen = run("frozen_lu")

    scale = np.abs(x_ref).max()
    assert np.abs(x_frozen - x_ref).max() < 1e-7 * scale
    # reuse: far fewer factorizations than the per-iteration solve ...
    assert fact_frozen < fact_ref / 2, (fact_frozen, fact_ref)
    # ... but at least the initial one plus the post-jump refresh
    assert fact_frozen >= 2, fact_frozen
