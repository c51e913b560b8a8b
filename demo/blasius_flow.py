#!/usr/bin/env python3
"""Flow past a zero-thickness flat plate (reference: demo/blasius_flow.py).

The plate is imposed as an internal no-slip constraint on interior facets.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd
import numpy as np

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import blasius_plate
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       StationaryProblem)


class BlasiusFlowProblem(StationaryProblem):
    def __init__(self, main_dir=None):
        super().__init__(main_dir)
        self._problem_name = "BlasiusFlow"

    def setup_mesh(self):
        self._mesh, self._boundary_markers, self._boundary_marker_map = \
            blasius_plate()

    def set_boundary_conditions(self):
        inlet_velocity = lambda x: np.stack(
            [np.ones(len(x)), np.zeros(len(x))], axis=1)
        bm = self._boundary_marker_map
        self._bcs = ((VelocityBCType.function, bm["inlet"], inlet_velocity),
                     (VelocityBCType.no_normal_flux, bm["bottom"], None),
                     (VelocityBCType.no_normal_flux, bm["top"], None))

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=200.0)

    def set_internal_constraints(self):
        self._internal_constraints = (
            (VelocityBCType.no_slip, self._boundary_marker_map["plate"],
             None),)

    def postprocess_solution(self):
        self._add_to_field_output(self._compute_pressure_gradient())
        self._add_to_field_output(self._compute_vorticity())


if __name__ == "__main__":
    problem = BlasiusFlowProblem()
    problem.solve_problem()
