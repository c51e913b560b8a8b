"""Stationary end-to-end solves via the Problem API.

Mirrors the reference's tests/test_stationary_solvers.py (cavity, channel
with 4 BC regimes and all 4 convective forms, periodic Couette with a
traction BC, gravity-driven open cube, Blasius plate with internal
constraints), upgraded from "it ran" to value-level assertions against
analytic solutions wherever one exists (SURVEY §4 implication).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from navierstokes_tpu.fem.bcs import (PressureBCType, TractionBCType,
                                      VelocityBCType)
from navierstokes_tpu.fem.spaces import axis_periodic
from navierstokes_tpu.mesh import (HyperCubeBoundaryMarkers,
                                   blasius_plate, hyper_cube,
                                   hyper_rectangle, open_hyper_cube)
from navierstokes_tpu.problems import (EquationCoefficientHandler,
                                       StationaryProblem)

M = HyperCubeBoundaryMarkers


def inlet_profile(x):
    return np.stack([6.0 * x[:, 1] * (1.0 - x[:, 1]),
                     np.zeros(len(x))], axis=1)


class CavityProblem(StationaryProblem):
    def __init__(self, n_points):
        super().__init__()
        self._write_output = False
        self._n_points = n_points
        self._problem_name = "Cavity"

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_cube(2, self._n_points)

    def set_boundary_conditions(self):
        self._bcs = ((VelocityBCType.no_slip, M.left.value, None),
                     (VelocityBCType.no_slip, M.right.value, None),
                     (VelocityBCType.no_slip, M.bottom.value, None),
                     (VelocityBCType.constant, M.top.value, (1.0, 0.0)))

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=10.0)


class ChannelFlowProblem(StationaryProblem):
    def __init__(self, n_points, bc_type="inlet",
                 form_convective_term="standard"):
        super().__init__(form_convective_term=form_convective_term)
        self._write_output = False
        self._n_points = n_points
        self._bc_type = bc_type
        self._problem_name = "ChannelFlow"

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_rectangle(
            (0.0, 0.0), (10.0, 1.0), (10 * self._n_points, self._n_points))

    def set_boundary_conditions(self):
        inlet_component = lambda x: 6.0 * x[:, 1] * (1.0 - x[:, 1])
        outlet_pressure = lambda x: np.zeros(len(x))
        bcs = []
        if self._bc_type == "inlet":
            bcs.append((VelocityBCType.function, M.left.value,
                        inlet_profile))
            bcs.append((VelocityBCType.no_slip, M.bottom.value, None))
            bcs.append((VelocityBCType.no_slip, M.top.value, None))
        elif self._bc_type == "pressure_gradient":
            bcs.append((PressureBCType.constant, M.left.value, 1.0))
            bcs.append((PressureBCType.constant, M.right.value, -1.0))
            bcs.append((VelocityBCType.no_slip, M.bottom.value, None))
            bcs.append((VelocityBCType.no_slip, M.top.value, None))
        elif self._bc_type == "inlet_pressure":
            bcs.append((VelocityBCType.function, M.left.value,
                        inlet_profile))
            bcs.append((VelocityBCType.no_slip, M.bottom.value, None))
            bcs.append((VelocityBCType.no_slip, M.top.value, None))
            bcs.append((PressureBCType.function, M.right.value,
                        outlet_pressure))
        elif self._bc_type == "inlet_component":
            bcs.append((VelocityBCType.function_component, M.left.value, 0,
                        inlet_component))
            bcs.append((VelocityBCType.no_slip, M.bottom.value, None))
            bcs.append((VelocityBCType.no_slip, M.top.value, None))
            bcs.append((PressureBCType.constant, M.right.value, 0.0))
        self._bcs = tuple(bcs)

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=1.0)


class CouetteProblem(StationaryProblem):
    """x-periodic Couette flow driven by a traction BC on the top wall."""

    def __init__(self, n_points):
        super().__init__()
        self._write_output = False
        self._n_points = n_points
        self._problem_name = "Couette"

    def setup_mesh(self):
        self._mesh, self._boundary_markers = hyper_cube(2, self._n_points)

    def set_boundary_conditions(self):
        self._bcs = ((VelocityBCType.no_slip, M.bottom.value, None),
                     (TractionBCType.constant_component, M.top.value, 0, 1.0),
                     (VelocityBCType.no_normal_flux, M.top.value, None))

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=1.0)

    def set_periodic_boundary_conditions(self):
        self._periodic_bcs = [axis_periodic(0, 0.0, 1.0)]
        self._periodic_boundary_ids = (M.left.value, M.right.value)


class GravityDrivenFlowProblem(StationaryProblem):
    def __init__(self, n_points):
        super().__init__()
        self._write_output = False
        self._n_points = n_points
        self._problem_name = "OpenCube"

    def setup_mesh(self):
        openings = (("bottom", (0.2, 0.0), 0.1),
                    ("left", (0.0, 0.5), 0.1),
                    ("right", (1.0, 0.7), 0.1),
                    ("bottom", (0.7, 0.0), 0.05),
                    ("top", (0.5, 1.0), 0.8))
        self._mesh, self._boundary_markers = open_hyper_cube(
            2, self._n_points, openings)

    def set_boundary_conditions(self):
        self._bcs = ((VelocityBCType.no_slip, M.left.value, None),
                     (VelocityBCType.no_slip, M.right.value, None),
                     (VelocityBCType.no_slip, M.bottom.value, None),
                     (VelocityBCType.no_slip, M.top.value, None))

    def set_equation_coefficients(self):
        self._coefficient_handler = EquationCoefficientHandler(Re=200.0,
                                                               Fr=10.0)

    def set_body_force(self):
        self._body_force = (0.0, -1.0)

    def postprocess_solution(self):
        self._add_to_field_output(self._compute_pressure_gradient())
        self._add_to_field_output(self._compute_vorticity())
        self._add_to_field_output(self._compute_stream_potential())
        # total boundary mass flux must vanish (continuity)
        solver = self._get_solver()
        from navierstokes_tpu.mesh.core import extract_all_boundary_markers

        u = self._get_velocity()
        flux = 0.0
        for bid in extract_all_boundary_markers(self._mesh,
                                                self._boundary_markers):
            fids = self._boundary_markers.ids_with_value(bid)
            if len(fids) == 0:
                continue
            batch = solver.operator.facet_batch_device(
                solver.space.facet_batch(fids))
            flux += float(solver.operator.boundary_velocity_flux(batch, u))
        self.mass_flux = flux


class BlasiusFlowProblem(StationaryProblem):
    def __init__(self):
        super().__init__()
        self._write_output = False
        self._problem_name = "BlasiusFlow"

    def setup_mesh(self):
        self._mesh, self._boundary_markers, self._boundary_marker_map = \
            blasius_plate(resolution=0.5)

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


def test_cavity():
    problem = CavityProblem(10)
    problem.solve_problem()
    u = problem._get_velocity()
    # lid velocity reproduced; interior velocities bounded by the lid speed
    assert np.isclose(float(jnp.abs(u[:, 0]).max()), 1.0)


def test_channel_flow():
    for bc_type in ("inlet", "pressure_gradient", "inlet_pressure",
                    "inlet_component"):
        problem = ChannelFlowProblem(5, bc_type=bc_type)
        problem.solve_problem()
        u = problem._get_velocity()
        p = problem._get_pressure()
        op = problem._get_solver().operator
        if bc_type == "pressure_gradient":
            # essential pressure data interacts with the natural outflow
            # condition: the discrete solution is boundary-layer in/outflow
            # near the ends, not Poiseuille (FEniCS behaves identically;
            # the reference test asserts nothing here).  Check wall
            # adherence and that the high-pressure end pushes fluid in.
            space = problem._get_solver().space
            walls = np.abs(space.u_coords[:, 1]
                           * (1 - space.u_coords[:, 1])) < 1e-12
            assert np.abs(np.asarray(u)[walls]).max() < 1e-12
            near_inlet = ((space.u_coords[:, 0] > 0.05)
                          & (space.u_coords[:, 0] < 0.5)
                          & (np.abs(space.u_coords[:, 1] - 0.5) < 0.3))
            assert np.asarray(u)[near_inlet, 0].mean() > 0.0
        else:
            # Poiseuille: exact in the P2 space
            assert op.l2_error_velocity(u, inlet_profile) < 1e-9
        if bc_type in ("inlet_pressure", "inlet_component"):
            p_exact = lambda x: 12.0 * (10.0 - x[:, 0])
            assert op.l2_error_pressure(p, p_exact) < 1e-8


def test_channel_flow_convective_forms():
    for form in ("standard", "rotational", "divergence", "skew_symmetric"):
        problem = ChannelFlowProblem(4, bc_type="inlet",
                                     form_convective_term=form)
        problem.solve_problem()
        u = problem._get_velocity()
        op = problem._get_solver().operator
        err = op.l2_error_velocity(u, inlet_profile)
        if form in ("rotational", "skew_symmetric"):
            # these forms alter the natural outflow condition (Bernoulli
            # pressure / a (u.n)u boundary term), perturbing the outflow
            # profile; the solution stays near-Poiseuille but not exactly
            assert err < 0.05, (form, err)
        else:
            # standard and divergence forms keep Poiseuille exact (the
            # interpolated profile is pointwise divergence-free)
            assert err < 1e-9, (form, err)


def test_couette_flow():
    problem = CouetteProblem(10)
    problem.solve_problem()
    u = problem._get_velocity()
    space = problem._get_solver().space
    # traction +1 with the reference's sign convention drives u_x = -y
    err = np.abs(np.asarray(u)[:, 0] + space.u_coords[:, 1]).max()
    assert err < 1e-12
    assert np.abs(np.asarray(u)[:, 1]).max() < 1e-12


def test_gravity_driven_flow():
    problem = GravityDrivenFlowProblem(40)
    problem.solve_problem()
    problem.postprocess_solution()
    # net mass flux through all openings vanishes
    assert abs(problem.mass_flux) < 1e-10


def test_blasius_flow():
    problem = BlasiusFlowProblem()
    problem.solve_problem()
    u = np.asarray(problem._get_velocity())
    space = problem._get_solver().space
    # velocity vanishes on the internal plate nodes
    on_plate = (np.abs(space.u_coords[:, 1] - 0.5) < 1e-9) \
        & (space.u_coords[:, 0] > -1e-9) & (space.u_coords[:, 0] < 1 + 1e-9)
    assert on_plate.sum() > 0
    assert np.abs(u[on_plate]).max() < 1e-12
    # free stream is recovered near the inlet
    far_field = space.u_coords[:, 0] < -0.9
    assert np.allclose(u[far_field, 0], 1.0, atol=0.1)


def test_cavity_re100_ghia_benchmark():
    """Lid-driven cavity at Re=100 vs the Ghia et al. (1982) centerline
    extrema (u_min = -0.21090 on the vertical centerline)."""
    mesh, markers = hyper_cube(2, 48)
    from navierstokes_tpu.solvers import StationarySolver

    solver = StationarySolver(mesh, markers)
    solver.set_boundary_conditions(
        ((VelocityBCType.no_slip, M.left.value, None),
         (VelocityBCType.no_slip, M.right.value, None),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.constant, M.top.value, (1.0, 0.0))))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 1.0 / 100.0,
         "pressure_term": 1.0, "coriolis_term": None, "euler_term": None,
         "body_force_term": None})
    solver.solve()
    u, _ = solver.space.split(solver.solution)
    u = np.asarray(u)
    centerline = np.abs(solver.space.u_coords[:, 0] - 0.5) < 1e-9
    u_min = u[centerline, 0].min()
    assert abs(u_min - (-0.2109)) < 0.006, u_min


def test_traction_function_bc():
    """TractionBCType.function_component (callable datum) must reproduce
    the constant-traction Couette solution when the callable is
    constant."""

    # the reference forbids a full-vector traction sharing a boundary id
    # with a velocity BC (component-wise only), so test the component
    # variant with a callable datum
    class ComponentFunctionTraction(CouetteProblem):
        def set_boundary_conditions(self):
            tfun = lambda x: np.ones(len(x))
            self._bcs = ((VelocityBCType.no_slip, M.bottom.value, None),
                         (TractionBCType.function_component, M.top.value,
                          0, tfun),
                         (VelocityBCType.no_normal_flux, M.top.value, None))

    problem = ComponentFunctionTraction(8)
    problem.solve_problem()
    u = problem._get_velocity()
    space = problem._get_solver().space
    err = np.abs(np.asarray(u)[:, 0] + space.u_coords[:, 1]).max()
    assert err < 1e-11, err


def test_reynolds_continuation_fallback():
    """When the direct solve fails, the problem driver re-solves through
    the automatic Reynolds-continuation ramp (the reference's only
    robustness mechanism, ns_problem.py:478-501)."""
    from navierstokes_tpu.solvers import StationarySolver

    class FailFirstSolver(StationarySolver):
        """Deterministically fail the first solve attempt."""

        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self._failed_once = False

        def solve(self):
            if not self._failed_once:
                self._failed_once = True
                raise RuntimeError("synthetic first-solve failure")
            super().solve()

    class HardCavity(CavityProblem):
        def __init__(self):
            super().__init__(12)

        def set_equation_coefficients(self):
            self._coefficient_handler = EquationCoefficientHandler(
                Re=500.0)

    problem = HardCavity()
    problem.setup_mesh()
    problem._navier_stokes_solver = FailFirstSolver(
        problem._mesh, problem._boundary_markers)
    problem.solve_problem()
    u = problem._get_velocity()
    assert np.isclose(float(jnp.abs(u[:, 0]).max()), 1.0)
    assert problem._coefficient_handler.Re == 500.0
    # the continuation ramp performed the full sequence of solves
    solves = problem._get_solver().monitor.nonlinear_solves()
    assert len(solves) >= 14
