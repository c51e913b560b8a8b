#!/usr/bin/env python3
"""Temporal convergence study on the Taylor-Green vortex.

Mirror of the reference's convergence_test/taylor_green_vortex.py: fixed
mesh, dt halved from 1.0 over six levels, L2(u)/L2(p) errors against the
analytic decay exp(-2 gamma^2 t / Re) at t = 1, loglog plot to PDF.
Expected: BDF-2 slope ~2 until the spatial error floor.

Usage: python convergence_test/taylor_green_vortex.py [n_points] [levels]
(default n_points=128 matches the reference; a third argument selects the
solver: "bdf" = monolithic BDF-2 like the reference study, "projection" =
the fused/spectral projection path, which runs the full 128^2 sweep in
seconds).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd
import sys

import numpy as np

from navierstokes_tpu.fem.bcs import PressureBCType
from navierstokes_tpu.fem.spaces import axis_periodic
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers, hyper_cube
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       InstationaryProblem)
from navierstokes_tpu.solvers import (ImplicitBDFSolver,
                                      ProjectionSolver)

M = HyperCubeBoundaryMarkers
GAMMA = 2.0 * np.pi
RE = 100.0


def exact_velocity(x, t):
    decay = np.exp(-2.0 * GAMMA ** 2 * t / RE)
    return decay * np.stack([
        np.cos(GAMMA * x[:, 0]) * np.sin(GAMMA * x[:, 1]),
        -np.sin(GAMMA * x[:, 0]) * np.cos(GAMMA * x[:, 1])], axis=1)


def exact_pressure(x, t):
    decay = np.exp(-4.0 * GAMMA ** 2 * t / RE)
    return -0.25 * decay * (np.cos(2 * GAMMA * x[:, 0])
                            + np.cos(2 * GAMMA * x[:, 1]))


class TaylorGreenVortex(InstationaryProblem):
    def __init__(self, time_step, n_points, solver_class=ImplicitBDFSolver):
        super().__init__(start_time=0.0, end_time=1.0,
                         desired_start_time_step=time_step,
                         n_max_steps=100000)
        self._write_output = False
        self._problem_name = "TaylorGreenVortexConvergence"
        self._n_points = n_points
        self._output_frequency = 0
        self._postprocessing_frequency = 0
        self.set_solver_class(solver_class)

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_cube(2, self._n_points)

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=RE)

    def set_initial_conditions(self):
        self._initial_conditions = {
            "velocity": lambda x: exact_velocity(x, 0.0),
            "pressure": lambda x: exact_pressure(x, 0.0),
        }

    def set_boundary_conditions(self):
        self._bcs = ((PressureBCType.mean_value, None, 0.0),)

    def set_periodic_boundary_conditions(self):
        self._periodic_bcs = [axis_periodic(0), axis_periodic(1)]
        self._periodic_boundary_ids = (M.left.value, M.right.value,
                                       M.top.value, M.bottom.value)

    def compute_errors(self):
        solver = self._get_solver()
        u, p = solver.space.split(solver.solution)
        t = self._time_stepping.current_time
        err_u = solver.operator.l2_error_velocity(
            u, lambda x: exact_velocity(x, t))
        err_p = solver.operator.l2_error_pressure(
            p, lambda x: exact_pressure(x, t))
        return err_u, err_p


def main(n_points=128, levels=6, solver="bdf"):
    solver_class = {"bdf": ImplicitBDFSolver,
                    "projection": ProjectionSolver}[solver]
    time_steps, u_errors, p_errors = [], [], []
    for i in range(levels):
        dt = 1.0 * 0.5 ** i
        problem = TaylorGreenVortex(dt, n_points, solver_class)
        problem.solve_problem()
        err_u, err_p = problem.compute_errors()
        time_steps.append(dt)
        u_errors.append(err_u)
        p_errors.append(err_p)
        print(f"dt = {dt:8.4f}: L2(u) = {err_u:.4e}, L2(p) = {err_p:.4e}",
              flush=True)

    orders = np.diff(-np.log2(u_errors))
    print("observed velocity orders:", np.round(orders, 2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.loglog(time_steps, u_errors, "o-", label="L2 velocity error")
        ax.loglog(time_steps, p_errors, "s-", label="L2 pressure error")
        ref = np.array(time_steps)
        ax.loglog(ref, u_errors[0] * (ref / ref[0]) ** 2, "k--",
                  label="2nd order")
        ax.set_xlabel("time step size")
        ax.set_ylabel("L2 error at t = 1")
        ax.legend()
        ax.grid(True, which="both", alpha=0.3)
        fig.savefig("taylor_green_convergence.pdf")
        print("wrote taylor_green_convergence.pdf")
    except Exception as exc:  # pragma: no cover
        print("plot skipped:", exc)
    return time_steps, u_errors, p_errors


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    solver = sys.argv[3] if len(sys.argv) > 3 else "bdf"
    main(n, levels, solver)
