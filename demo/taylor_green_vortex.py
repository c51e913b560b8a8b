#!/usr/bin/env python3
"""Doubly periodic Taylor-Green vortex, BDF-2 monolithic (reference:
demo/taylor_green_vortex.py)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd
import numpy as np

from navierstokes_tpu.fem.bcs import PressureBCType
from navierstokes_tpu.fem.spaces import axis_periodic
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers, hyper_cube
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       InstationaryProblem)
from navierstokes_tpu.solvers import ImplicitBDFSolver

M = HyperCubeBoundaryMarkers
GAMMA = 2.0 * np.pi


class TaylorGreenVortex(InstationaryProblem):
    def __init__(self, main_dir=None, n_points=32):
        super().__init__(main_dir, start_time=0.0, end_time=1.0,
                         desired_start_time_step=0.01, n_max_steps=200)
        self._problem_name = "TaylorGreenVortex"
        self._n_points = n_points
        self._output_frequency = 10
        self._postprocessing_frequency = 0
        self.set_solver_class(ImplicitBDFSolver)

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_cube(2, self._n_points)

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=100.0)

    def set_initial_conditions(self):
        g = GAMMA
        self._initial_conditions = {
            "velocity": lambda x: np.stack(
                [np.cos(g * x[:, 0]) * np.sin(g * x[:, 1]),
                 -np.sin(g * x[:, 0]) * np.cos(g * x[:, 1])], axis=1),
            "pressure": lambda x: -0.25 * (np.cos(2 * g * x[:, 0])
                                           + np.cos(2 * g * x[:, 1])),
        }

    def set_boundary_conditions(self):
        self._bcs = ((PressureBCType.mean_value, None, 0.0),)

    def set_periodic_boundary_conditions(self):
        self._periodic_bcs = [axis_periodic(0), axis_periodic(1)]
        self._periodic_boundary_ids = (M.left.value, M.right.value,
                                       M.top.value, M.bottom.value)


if __name__ == "__main__":
    taylor_green = TaylorGreenVortex()
    taylor_green.solve_problem()
