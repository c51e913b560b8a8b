#!/usr/bin/env python3
"""Triply periodic 3D box through the spectral projection fast path.

The 3D face of the reference's dimension-agnostic problem API (its
dolfin problems run unchanged in 3D, e.g. grid_generator.py:67-151):
an ``InstationaryProblem`` on a periodic Kuhn-tetrahedralized cube,
solved by ``ProjectionSolver``, which auto-detects the triply periodic
structured lattice and lowers every linear solve to exact 8x8 spectral
block solves (structured/spectral.py).

The initial condition is the unidirectional shear wave
u = (cos(2 pi y), 0, 0): divergence-free with (u.grad)u == 0, so it is
an EXACT Navier-Stokes solution decaying as e^{-nu g^2 t} -- the demo
prints the measured vs analytic amplitude at the end (the convection
kernel runs; its contribution is zero to machine precision).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd
import numpy as np

from navierstokes_tpu.fem.bcs import PressureBCType
from navierstokes_tpu.fem.spaces import axis_periodic
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers, hyper_cube
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       InstationaryProblem)
from navierstokes_tpu.solvers import ProjectionSolver

M = HyperCubeBoundaryMarkers
GAMMA = 2.0 * np.pi
RE = 100.0


class PeriodicBox3D(InstationaryProblem):
    def __init__(self, main_dir=None, n_points=16):
        super().__init__(main_dir, start_time=0.0, end_time=0.5,
                         desired_start_time_step=0.01, n_max_steps=100)
        self._problem_name = "PeriodicBox3D"
        self._n_points = n_points
        self._output_frequency = 0
        self._postprocessing_frequency = 0
        self.set_solver_class(ProjectionSolver)

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_cube(3, self._n_points)

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=RE)

    def set_initial_conditions(self):
        self._initial_conditions = {
            "velocity": lambda x: np.stack(
                [np.cos(GAMMA * x[:, 1]),
                 np.zeros(len(x)), np.zeros(len(x))], axis=1),
        }

    def set_boundary_conditions(self):
        self._bcs = ((PressureBCType.mean_value, None, 0.0),)

    def set_periodic_boundary_conditions(self):
        self._periodic_bcs = [axis_periodic(a) for a in range(3)]
        self._periodic_boundary_ids = (M.left.value, M.right.value,
                                       M.top.value, M.bottom.value,
                                       M.back.value, M.front.value)


if __name__ == "__main__":
    problem = PeriodicBox3D()
    problem.solve_problem()
    solver = problem._navier_stokes_solver
    u, _ = solver.space.split(np.asarray(solver.solution))
    amp = np.abs(u).max()
    t = problem._time_stepping.current_time
    expected = np.exp(-(1.0 / RE) * GAMMA ** 2 * t)
    print(f"spectral path: {solver._step_kind}")
    print(f"max|u| = {amp:.8f}, analytic {expected:.8f} "
          f"(rel err {abs(amp - expected) / expected:.2e})")
