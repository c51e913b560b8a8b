"""PCD block preconditioning of the monolithic saddle-point system.

SURVEY.md hard part #1: without a preconditioner, Krylov on the
Taylor-Hood saddle point stalls; PCD-preconditioned FGMRES must converge
to tight tolerances in O(100) iterations and reproduce the direct-solve
solution.
"""

import pytest

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


@pytest.mark.slow
def test_pcd_full_solve_matches_direct():
    s_direct = _cavity_solver(12, 10.0)
    s_direct.solve()
    s_pcd = _cavity_solver(12, 10.0, linear_solver="pcd")
    s_pcd.solve()
    diff = float(jnp.abs(s_direct.solution - s_pcd.solution).max())
    assert diff < 1e-7, diff


def test_matrix_free_jacobian_matches_csr():
    """linearize_at (the at-scale matvec: no CSR ever formed) reproduces
    the assembled Newton AND Picard Jacobian actions exactly."""
    import jax

    s = _cavity_solver(10, 50.0)
    s._setup_problem()
    op = s.operator
    scalars = s._scalars()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(s.space.n_dofs))
    v = jnp.asarray(rng.standard_normal(s.space.n_dofs))
    for picard in (False, True):
        J = op.jacobian_csr(x, scalars, 0.0, picard=picard)

        @jax.jit
        def mv(w, picard=picard):
            _, jvp = op.linearize_at(x, scalars, 0.0, picard=picard)
            return jvp(w)

        err = float(jnp.abs(J.matvec(v) - mv(v)).max())
        assert err < 1e-12, (picard, err)


def test_matrix_free_pcd_newton_system():
    """MatrixFreePCD solves a Newton system at the nonlinear solution to
    tight relative tolerance -- the configuration where the round-1
    BiCGStab-based preconditioner stalled at 1e-2 (NaN-poisoned inner
    solves)."""
    from navierstokes_tpu.linalg.block_precond import MatrixFreePCD

    s = _cavity_solver(12, 100.0, linear_solver="dense")
    s.solve()
    x = s.solution
    op = s.operator
    scalars = s._scalars()
    ctx = MatrixFreePCD(op, max_cycles=15)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(s.space.n_dofs))
    dx, res, its = ctx.solve(x, b, scalars, 0.0, picard=False,
                             tol=1e-8, atol=0.0)
    assert float(res) <= 1e-7 * float(jnp.linalg.norm(b)), float(res)
    # solution verifies against the assembled operator
    J = op.jacobian_csr(x, scalars, 0.0, picard=False)
    check = float(jnp.linalg.norm(J.matvec(dx) - b))
    assert check <= 1e-6 * float(jnp.linalg.norm(b)), check


@pytest.mark.slow
def test_matrix_free_pcd_full_contract_moderate_re():
    """End-to-end 1e-10 contract through the matrix-free path at a
    convective Reynolds number (restart-80 regime: GMRES(40) stagnates
    here).  Small enough for CI; the at-scale runs are in
    docs/VALIDATION.md."""
    s = _cavity_solver(24, 150.0, linear_solver="pcd")
    s.solve()
    recs = [r for r in s.monitor.records if r["kind"] == "nonlinear_solve"]
    assert recs[-1]["residual"] <= 1e-10


@pytest.mark.slow
def test_default_grad_div_policy_high_re_direct_solve():
    """Round-4 verdict item 5: beyond Re ~ 200 the STEADY PCD stack
    engages the grad-div/AL Schur approximation by default (gamma=0.3,
    the measured 32^2/64^2 ladder sweet spot), making high-Re cavity
    solves direct Newton instead of the march->PTC relay."""
    s = _cavity_solver(24, 300.0, linear_solver="pcd")
    s.solve()
    assert s._pcd_ctx.grad_div == 0.3
    recs = [r for r in s.monitor.records if r["kind"] == "nonlinear_solve"]
    assert recs[-1]["residual"] <= 1e-10
    # below the threshold the transitional policy keeps plain PCD
    s2 = _cavity_solver(24, 100.0, linear_solver="pcd")
    s2.solve()
    assert s2._pcd_ctx.grad_div == 0.0
