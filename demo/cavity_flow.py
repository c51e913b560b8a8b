#!/usr/bin/env python3
"""Lid-driven cavity at Re=10 (reference: demo/cavity_flow.py)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd
import numpy as np  # noqa: F401

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers, hyper_cube
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       StationaryProblem)


class CavityProblem(StationaryProblem):
    def __init__(self, n_points, main_dir=None):
        super().__init__(main_dir)
        self._n_points = n_points
        self._problem_name = "Cavity"

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_cube(2, self._n_points)

    def set_boundary_conditions(self):
        M = HyperCubeBoundaryMarkers
        self._bcs = ((VelocityBCType.no_slip, M.left.value, None),
                     (VelocityBCType.no_slip, M.right.value, None),
                     (VelocityBCType.no_slip, M.bottom.value, None),
                     (VelocityBCType.constant, M.top.value, (1.0, 0.0)))

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=10.0)


if __name__ == "__main__":
    cavity_flow = CavityProblem(25)
    cavity_flow.solve_problem()
