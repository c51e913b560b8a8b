"""3D (tetrahedral) discretization: exact Couette flow in a cube.

u = (y, 0, 0) with constant pressure solves Navier-Stokes exactly and lies
in the P2 space, so the 3D elements/assembly/BC/solve path must reproduce
it to machine precision.
"""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.solvers import StationarySolver


def shear_field(x):
    return np.stack([x[:, 1], np.zeros(len(x)), np.zeros(len(x))], axis=1)


def test_3d_couette_exact():
    mesh, markers = hyper_cube(3, 3)
    solver = StationarySolver(mesh, markers)
    bcs = tuple((VelocityBCType.function, face.value, shear_field)
                for face in (M.left, M.right, M.bottom, M.top, M.back,
                             M.front))
    solver.set_boundary_conditions(bcs)
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 0.5, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None, "body_force_term": None})
    solver.solve()
    u, p = solver.space.split(solver.solution)
    err = solver.operator.l2_error_velocity(u, shear_field)
    assert err < 1e-11, err
    assert solver.operator.divergence_l2(u) < 1e-11
    # pressure constant (pinned to 0)
    assert float(jnp.abs(p).max()) < 1e-9


def test_3d_cavity_converges():
    mesh, markers = hyper_cube(3, 4)
    solver = StationarySolver(mesh, markers)
    bcs = [(VelocityBCType.no_slip, face.value, None)
           for face in (M.left, M.right, M.bottom, M.back, M.front)]
    bcs.append((VelocityBCType.constant, M.top.value, (1.0, 0.0, 0.0)))
    solver.set_boundary_conditions(tuple(bcs))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 0.1, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None, "body_force_term": None})
    solver.solve()
    u, _ = solver.space.split(solver.solution)
    assert np.isclose(float(jnp.abs(u[:, 0]).max()), 1.0)
    assert bool(jnp.all(jnp.isfinite(u)))


def test_3d_duct_projection_solver_banded_engine():
    """3D second front (round-2 verdict item 9): the gather-free banded
    engine + ProjectionSolver recover exact plane Poiseuille in a 3D duct
    (no-slip plates, no-normal-flux side walls -- the profile y(1-y) is in
    the P2 space and constant in z, so it is the exact steady state)."""
    from navierstokes_tpu.fem.bcs import PressureBCType
    from navierstokes_tpu.mesh import hyper_rectangle
    from navierstokes_tpu.solvers import ProjectionSolver
    from navierstokes_tpu.timestepping import BDFTimeStepping

    mesh, markers = hyper_rectangle((0.0, 0.0, 0.0), (3.0, 1.0, 1.0),
                                    (9, 3, 3))
    ts = BDFTimeStepping(0.0, 100.0, desired_start_time_step=0.05)
    solver = ProjectionSolver(mesh, markers, "standard", ts,
                              cg_iters=(60, 600, 30), cg_rtol=1e-12)
    inlet = lambda x: np.stack(
        [x[:, 1] * (1 - x[:, 1]), np.zeros(len(x)), np.zeros(len(x))],
        axis=1)
    solver.set_boundary_conditions(
        ((VelocityBCType.function, M.left.value, inlet),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.no_slip, M.top.value, None),
         (VelocityBCType.no_normal_flux, M.back.value, None),
         (VelocityBCType.no_normal_flux, M.front.value, None),
         (PressureBCType.constant, M.right.value, 0.0)))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 0.1,
         "pressure_term": 1.0})
    solver.set_initial_conditions({"velocity": (0.0, 0.0, 0.0)})
    for _ in range(100):
        ts.update_coefficients()
        solver.solve()
        ts.advance_time()
        solver.advance_time()
    assert solver._step_kind == "fast"
    space = solver.space
    u, _ = space.split(np.asarray(solver.solution))
    ue = np.stack([space.u_coords[:, 1] * (1 - space.u_coords[:, 1]),
                   np.zeros(space.n_unodes), np.zeros(space.n_unodes)],
                  axis=1)
    assert np.abs(u - ue).max() < 1e-6


def test_3d_halo_operators_match_reference():
    """The halo-exchange layer is dimension-agnostic: 8-device 3D
    operators equal the single-device reference to roundoff."""
    from navierstokes_tpu.parallel.halo import HaloCellOperator
    from navierstokes_tpu.parallel.sharded import (ShardedCellOperator,
                                                   device_mesh)

    mesh, _ = hyper_cube(3, 5)
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace

    space = TaylorHoodSpace(mesh)
    ref = ShardedCellOperator(space, device_mesh(1))
    op = HaloCellOperator(space, device_mesh(8))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(space.n_velocity_dofs))
    p = jnp.asarray(rng.standard_normal(space.n_pnodes))
    a0 = jnp.asarray(2.0)

    checks = [
        (op.unpad_velocity(op.make_velocity_helmholtz(0.1)(
            op.pad_velocity(u), a0)),
         ref.make_velocity_helmholtz(0.1)(u, a0)),
        (op.unpad_velocity(op.make_convection_rhs(1.0)(
            op.pad_velocity(u))),
         ref.make_convection_rhs(1.0)(u)),
        (op.unpad_pressure(op.make_divergence()(op.pad_velocity(u))),
         ref.make_divergence()(u)),
        (op.unpad_velocity(op.make_gradient()(op.pad_pressure(p))),
         ref.make_gradient()(p)),
    ]
    for got, want in checks:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)
