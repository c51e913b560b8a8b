"""PCD block preconditioning of the monolithic saddle-point system.

SURVEY.md hard part #1: without a preconditioner, Krylov on the
Taylor-Hood saddle point stalls; PCD-preconditioned FGMRES must converge
to tight tolerances in O(100) iterations and reproduce the direct-solve
solution.
"""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.linalg.block_precond import PCDPreconditioner
from navierstokes_tpu.linalg.fgmres import fgmres
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.solvers import StationarySolver


def _cavity_solver(n, Re, linear_solver=None):
    mesh, markers = hyper_cube(2, n)
    s = StationarySolver(mesh, markers, linear_solver=linear_solver)
    s.set_boundary_conditions(
        ((VelocityBCType.no_slip, M.left.value, None),
         (VelocityBCType.no_slip, M.right.value, None),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.constant, M.top.value, (1.0, 0.0))))
    s.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 1.0 / Re,
         "pressure_term": 1.0, "coriolis_term": None, "euler_term": None,
         "body_force_term": None})
    return s


def test_pcd_fgmres_beats_unpreconditioned():
    s = _cavity_solver(16, 50.0)
    s._setup_problem()
    op = s.operator
    scalars = s._scalars()
    bcv = s._bc_values()
    x = s._apply_bc_values_to_x(s._solution)
    r = op.residual(x, bcv, scalars, 0.0, None)
    J = op.jacobian_csr(x, scalars, 0.0, picard=True)
    u0, _ = s.space.split(x)

    pcd = PCDPreconditioner(op, J.matvec, visc=scalars["cv"], accel0=0.0,
                            u_current=u0, f_iters=20, lp_iters=40,
                            mp_iters=5)
    dx, res, its = fgmres(J.matvec, -r, M_apply=pcd.apply, tol=1e-9,
                          restart=50, maxiter=150)
    assert float(res) <= 1e-9 * float(jnp.linalg.norm(r)) * 10
    assert its < 150

    _, res_none, _ = fgmres(J.matvec, -r, M_apply=None, tol=1e-9,
                            restart=50, maxiter=150)
    # unpreconditioned stalls orders of magnitude higher
    assert float(res_none) > 1e3 * float(res)


def test_pcd_full_solve_matches_direct():
    s_direct = _cavity_solver(12, 10.0)
    s_direct.solve()
    s_pcd = _cavity_solver(12, 10.0, linear_solver="pcd")
    s_pcd.solve()
    diff = float(jnp.abs(s_direct.solution - s_pcd.solution).max())
    assert diff < 1e-7, diff
