"""Smoothed-aggregation AMG: h-independent preconditioning of the P1
pressure Laplacian (the inner-solve engine of the at-scale PCD path,
replacing the reference's PETSc direct LU, ns_solver_base.py:938)."""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.linalg.amg import (AMG, pressure_laplacian_scipy,
                                         pressure_mass_scipy,
                                         symmetric_dirichlet)
from navierstokes_tpu.mesh import hyper_cube


def _amg_cg_iterations(n, dirichlet=False, tol=1e-10):
    mesh, _ = hyper_cube(2, n)
    space = TaylorHoodSpace(mesh)
    if dirichlet:
        # pin the pressure nodes on x=0 (like an outflow pressure BC)
        xp = space.p_coords
        dofs = np.where(np.abs(xp[:, 0]) < 1e-12)[0]
        A = pressure_laplacian_scipy(space, dirichlet_dofs=dofs)
    else:
        K = pressure_laplacian_scipy(space)
        M = pressure_mass_scipy(space)
        shift = 1e-2 * (K.diagonal().mean() / M.diagonal().mean())
        A = pressure_laplacian_scipy(space, mass_shift=shift)
    amg = AMG(A)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(space.n_pnodes))
    A0 = amg.levels[0]["A"]

    x = jnp.zeros_like(b)
    r = b
    z = amg.apply(r)
    p = z
    rz = jnp.vdot(r, z)
    b_norm = float(jnp.linalg.norm(b))
    for k in range(200):
        Ap = A0.matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        if float(jnp.linalg.norm(r)) < tol * b_norm:
            return k + 1, float(jnp.linalg.norm(b - A0.matvec(x))) / b_norm
        z = amg.apply(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        rz = rz_new
    return 200, float(jnp.linalg.norm(b - A0.matvec(x))) / b_norm


def test_amg_h_independence_regularized():
    """CG+AMG iteration counts stay O(1) as h halves (fixed CG sweeps,
    the round-1 inner solver, degrade as O(1/h))."""
    its = {}
    for n in (16, 32, 64):
        its[n], rel = _amg_cg_iterations(n)
        assert rel < 1e-9, (n, rel)
    assert its[64] <= 30, its
    assert its[64] <= its[16] + 10, its


def test_amg_dirichlet_variant():
    its, rel = _amg_cg_iterations(32, dirichlet=True)
    assert rel < 1e-9
    assert its <= 30, its


def test_amg_vcycle_reduces_error():
    """A single V-cycle contracts the error of a random initial guess."""
    mesh, _ = hyper_cube(2, 24)
    space = TaylorHoodSpace(mesh)
    xp_coords = space.p_coords
    dofs = np.where(np.abs(xp_coords[:, 0]) < 1e-12)[0]
    A = pressure_laplacian_scipy(space, dirichlet_dofs=dofs)
    amg = AMG(A)
    A0 = amg.levels[0]["A"]

    rng = np.random.default_rng(1)
    x_exact = jnp.asarray(rng.standard_normal(space.n_pnodes))
    b = A0.matvec(x_exact)
    x = amg.apply(b)       # one V-cycle from zero
    e0 = float(jnp.linalg.norm(x_exact))
    e1 = float(jnp.linalg.norm(x - x_exact))
    assert e1 < 0.5 * e0, (e1, e0)


def test_symmetric_dirichlet_preserves_spd():
    import scipy.sparse.linalg as spla

    mesh, _ = hyper_cube(2, 12)
    space = TaylorHoodSpace(mesh)
    A = pressure_laplacian_scipy(space)
    Ad = symmetric_dirichlet(A, np.array([0, 5, 7]))
    dense = Ad.toarray()
    assert np.allclose(dense, dense.T)
    assert np.all(np.linalg.eigvalsh(dense) > -1e-12)
    # pinned rows are exact identity
    for d in (0, 5, 7):
        row = dense[d]
        assert row[d] == 1.0 and np.abs(row).sum() == 1.0
