"""IPCS fractional-step solver: transient channel flow.

Mirrors the reference's tests/test_ipcs_solver.py (50x5 channel, Re=10,
dt=0.002, 10 steps) with value assertions on the inflow trace and
divergence reduction after projection.
"""

import pytest

import numpy as np

from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
from navierstokes_tpu.mesh import HyperRectangleBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_rectangle
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       InstationaryProblem)
from navierstokes_tpu.solvers import IPCSSolver


def inlet_profile(x):
    return np.stack([6.0 * x[:, 1] * (1.0 - x[:, 1]),
                     np.zeros(len(x))], axis=1)


class ChannelFlowProblem(InstationaryProblem):
    def __init__(self, n_points):
        super().__init__(start_time=0.0, end_time=1.0,
                         desired_start_time_step=0.002, n_max_steps=10)
        self._write_output = False
        self._n_points = n_points
        self._problem_name = "ChannelFlowIPCS"
        self._output_frequency = 0
        self._postprocessing_frequency = 1
        self.set_solver_class(IPCSSolver)

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_rectangle(
            (0.0, 0.0), (10.0, 1.0), (10 * self._n_points, self._n_points))

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=10.0)

    def set_initial_conditions(self):
        self._initial_conditions = {"velocity": (0.0, 0.0),
                                    "pressure": 0.0}

    def set_boundary_conditions(self):
        self._bcs = ((PressureBCType.constant, M.right.value, 0.0),
                     (VelocityBCType.function, M.left.value, inlet_profile),
                     (VelocityBCType.no_slip, M.bottom.value, None),
                     (VelocityBCType.no_slip, M.top.value, None))

    def postprocess_solution(self):
        self._add_to_field_output(self._compute_pressure_gradient())
        self._add_to_field_output(self._compute_vorticity())


def test_channel_flow_ipcs():
    problem = ChannelFlowProblem(5)
    problem.solve_problem()
    assert problem._time_stepping.step_number == 10

    solver = problem._get_solver()
    u = np.asarray(problem._get_velocity())
    space = solver.space
    # inflow trace enforced exactly by the correction-step BCs
    inlet = np.abs(space.u_coords[:, 0]) < 1e-12
    expected = 6.0 * space.u_coords[inlet, 1] * (1 - space.u_coords[inlet, 1])
    assert np.abs(u[inlet, 0] - expected).max() < 1e-12
    # walls adhere
    walls = np.abs(space.u_coords[:, 1] * (1 - space.u_coords[:, 1])) < 1e-12
    assert np.abs(u[walls]).max() < 1e-12
    # velocities bounded by the inlet maximum plus transient overshoot
    assert np.abs(u).max() < 3.0


def _run_scheme(scheme, n_steps=6):
    import jax.numpy as jnp
    from navierstokes_tpu.solvers.ipcs import IPCSSolver as S
    from navierstokes_tpu.timestepping import BDFTimeStepping

    mesh, markers = hyper_rectangle((0.0, 0.0), (10.0, 1.0), (30, 3))
    ts = BDFTimeStepping(0.0, 1.0, desired_start_time_step=0.002)
    solver = S(mesh, markers, "standard", ts, scheme=scheme)
    solver.set_boundary_conditions(
        ((PressureBCType.constant, M.right.value, 0.0),
         (VelocityBCType.function, M.left.value, inlet_profile),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.no_slip, M.top.value, None)))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 0.1, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None, "body_force_term": None})
    solver.set_initial_conditions({"velocity": (0.0, 0.0), "pressure": 0.0})
    for _ in range(n_steps):
        ts.update_coefficients()
        solver.solve()
        ts.advance_time()
        solver.advance_time()
    u = np.asarray(solver.space.split(solver.solution)[0])
    assert np.all(np.isfinite(u))
    space = solver.space
    inlet = np.abs(space.u_coords[:, 0]) < 1e-12
    expected = 6.0 * space.u_coords[inlet, 1] * (1 - space.u_coords[inlet, 1])
    assert np.abs(u[inlet, 0] - expected).max() < 1e-12
    return u


def test_chorin_scheme():
    """Non-incremental Chorin variant (reference scripts/test_chorin.py)."""
    u = _run_scheme("chorin")
    assert np.abs(u).max() < 3.0


def test_phi_increment_scheme():
    """Pressure-increment variant with eta=[2,-1] extrapolation
    (reference scripts/test_ipcs_phi.py): verified against the analytic
    Taylor-Green decay (the impulsive-start channel makes the pressure
    extrapolation overshoot, so a smooth problem is the right check)."""
    from navierstokes_tpu.fem.spaces import axis_periodic
    from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as HM
    from navierstokes_tpu.mesh import hyper_cube
    from navierstokes_tpu.solvers.ipcs import IPCSSolver as S
    from navierstokes_tpu.timestepping import BDFTimeStepping

    g = 2.0 * np.pi
    Re = 100.0

    def tg_u(x, t=0.0):
        d = np.exp(-2 * g * g * t / Re)
        return d * np.stack([np.cos(g * x[:, 0]) * np.sin(g * x[:, 1]),
                             -np.sin(g * x[:, 0]) * np.cos(g * x[:, 1])],
                            axis=1)

    mesh, markers = hyper_cube(2, 16)
    ts = BDFTimeStepping(0.0, 1.0, desired_start_time_step=0.02)
    solver = S(mesh, markers, "standard", ts, scheme="phi")
    solver.set_periodic_boundary_conditions(
        [axis_periodic(0), axis_periodic(1)],
        (HM.left.value, HM.right.value, HM.top.value, HM.bottom.value))
    solver.set_boundary_conditions(((PressureBCType.mean_value, None, 0.0),))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 1.0 / Re,
         "pressure_term": 1.0, "coriolis_term": None, "euler_term": None,
         "body_force_term": None})
    solver.set_initial_conditions({
        "velocity": tg_u,
        "pressure": lambda x: -0.25 * (np.cos(2 * g * x[:, 0])
                                       + np.cos(2 * g * x[:, 1]))})
    for _ in range(10):
        ts.update_coefficients()
        solver.solve()
        ts.advance_time()
        solver.advance_time()
    u, _ = solver.space.split(solver.solution)
    err = solver.operator.l2_error_velocity(
        u, lambda x: tg_u(x, ts.current_time))
    assert err < 3e-3, err


@pytest.mark.slow
def test_ipcs_temporal_order():
    """IPCS temporal convergence on Taylor-Green: second order in dt
    (the BASELINE.json 'BDF-2 monolithic vs IPCS dt refinement' config)."""
    import math

    from navierstokes_tpu.fem.spaces import axis_periodic
    from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as HM
    from navierstokes_tpu.mesh import hyper_cube
    from navierstokes_tpu.timestepping import BDFTimeStepping

    g = 2 * np.pi
    Re = 100.0

    def u_ex(x, t):
        d = np.exp(-2 * g * g * t / Re)
        return d * np.stack([np.cos(g * x[:, 0]) * np.sin(g * x[:, 1]),
                             -np.sin(g * x[:, 0]) * np.cos(g * x[:, 1])],
                            axis=1)

    def p_ex(x, t):
        return -0.25 * np.exp(-4 * g * g * t / Re) * (
            np.cos(2 * g * x[:, 0]) + np.cos(2 * g * x[:, 1]))

    def run(dt):
        mesh, markers = hyper_cube(2, 24)
        ts = BDFTimeStepping(0.0, 0.2, desired_start_time_step=dt)
        from navierstokes_tpu.solvers.ipcs import IPCSSolver as S

        s = S(mesh, markers, "standard", ts)
        s.set_periodic_boundary_conditions(
            [axis_periodic(0), axis_periodic(1)],
            (HM.left.value, HM.right.value, HM.top.value, HM.bottom.value))
        s.set_boundary_conditions(
            ((PressureBCType.mean_value, None, 0.0),))
        s.set_equation_coefficients(
            {"convective_term": 1.0, "viscous_term": 1.0 / Re,
             "pressure_term": 1.0, "coriolis_term": None,
             "euler_term": None, "body_force_term": None})
        s.set_initial_conditions({"velocity": lambda x: u_ex(x, 0.0),
                                  "pressure": lambda x: p_ex(x, 0.0)})
        while not ts.is_at_end():
            ts.update_coefficients()
            s.solve()
            ts.advance_time()
            s.advance_time()
        u, _ = s.space.split(s.solution)
        return s.operator.l2_error_velocity(
            u, lambda x: u_ex(x, ts.current_time))

    e_coarse = run(0.04)
    e_fine = run(0.02)
    order = math.log2(e_coarse / e_fine)
    assert order > 1.7, (e_coarse, e_fine, order)
