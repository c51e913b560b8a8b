"""Dof-partitioned halo-exchange operators (parallel/halo.py).

VERDICT round-1 weak #6: the cell-sharded layer psums full-length vectors
(per-device memory O(global dofs)).  Here every operator's 8-device result
must equal the single-device reference to roundoff, while per-device
storage is O(dofs/n_dev + halo) with halo << owned.
"""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.parallel.halo import HaloCellOperator
from navierstokes_tpu.parallel.sharded import (ShardedCellOperator,
                                               device_mesh)


def _reference_results(space, u, p):
    ref = ShardedCellOperator(space, device_mesh(1))
    return {
        "mass": np.asarray(ref.make_velocity_mass()(u)),
        "helm": np.asarray(ref.make_velocity_helmholtz(0.1)(u, 2.0)),
        "grad": np.asarray(ref.make_gradient()(p)),
        "div": np.asarray(ref.make_divergence()(u)),
        "lap": np.asarray(ref.make_pressure_stiffness()(p)),
        "conv": np.asarray(ref.make_convection_rhs(1.0)(u)),
    }


def _halo_results(op, u, p):
    up = op.pad_velocity(u)
    pp = op.pad_pressure(p)
    return {
        "mass": np.asarray(op.unpad_velocity(op.make_velocity_mass()(up))),
        "helm": np.asarray(op.unpad_velocity(
            op.make_velocity_helmholtz(0.1)(up, 2.0))),
        "grad": np.asarray(op.unpad_velocity(op.make_gradient()(pp))),
        "div": np.asarray(op.unpad_pressure(op.make_divergence()(up))),
        "lap": np.asarray(op.unpad_pressure(
            op.make_pressure_stiffness()(pp))),
        "conv": np.asarray(op.unpad_velocity(
            op.make_convection_rhs(1.0)(up))),
    }


def test_halo_operators_match_reference_across_device_counts():
    mesh, _ = hyper_cube(2, 12)
    space = TaylorHoodSpace(mesh)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(space.n_velocity_dofs))
    p = jnp.asarray(rng.standard_normal(space.n_pnodes))
    ref = _reference_results(space, u, p)

    for ndev in (1, 2, 8):
        op = HaloCellOperator(space, device_mesh(ndev))
        got = _halo_results(op, u, p)
        for name in ref:
            err = np.abs(got[name] - ref[name]).max()
            scale = np.abs(ref[name]).max()
            assert err <= 1e-13 * max(scale, 1.0), (ndev, name, err)


def test_halo_memory_is_partitioned():
    """Per-device storage O(dofs/n_dev + halo), halo a small fraction."""
    mesh, _ = hyper_cube(2, 24)
    space = TaylorHoodSpace(mesh)
    op = HaloCellOperator(space, device_mesh(8))
    rep = op.halo_report()
    assert rep["u_nodes_per_device"] < space.n_unodes / 4
    assert rep["u_halo_per_device"] < rep["u_nodes_per_device"]
    assert rep["p_halo_per_device"] < rep["p_nodes_per_device"]


def test_halo_pad_roundtrip():
    mesh, _ = hyper_cube(2, 8)
    space = TaylorHoodSpace(mesh)
    op = HaloCellOperator(space, device_mesh(8))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(space.n_velocity_dofs))
    p = jnp.asarray(rng.standard_normal(space.n_pnodes))
    assert np.array_equal(np.asarray(op.unpad_velocity(op.pad_velocity(u))),
                          np.asarray(u))
    assert np.array_equal(np.asarray(op.unpad_pressure(op.pad_pressure(p))),
                          np.asarray(p))


def test_halo_cg_solves_pressure_poisson():
    """End-to-end: a CG solve entirely in the partitioned layout (dots and
    axpys on sharded vectors, halo exchanges inside the matvec)."""
    mesh, _ = hyper_cube(2, 12)
    space = TaylorHoodSpace(mesh)
    op = HaloCellOperator(space, device_mesh(8))
    lap = op.make_pressure_stiffness()

    rng = np.random.default_rng(2)
    x_exact = rng.standard_normal(space.n_pnodes)
    x_exact -= x_exact.mean()
    b = lap(op.pad_pressure(jnp.asarray(x_exact)))

    # stay in the partitioned layout: mask out padding slots, subtract the
    # mean over real nodes (unpad/pad would bounce between shardings)
    mask = op.pad_pressure(jnp.ones(space.n_pnodes))

    def project(v):
        m = jnp.sum(v * mask) / jnp.sum(mask)
        return (v - m) * mask

    x = jnp.zeros_like(b)
    r = project(b)
    pvec = r
    rz = jnp.vdot(r, r)
    for _ in range(400):
        Ap = project(lap(pvec))
        alpha = rz / jnp.vdot(pvec, Ap)
        x = x + alpha * pvec
        r = r - alpha * Ap
        rz_new = jnp.vdot(r, r)
        if float(jnp.sqrt(rz_new)) < 1e-10:
            break
        pvec = r + (rz_new / rz) * pvec
        rz = rz_new
    sol = np.array(op.unpad_pressure(x))
    sol -= sol.mean()
    assert np.abs(sol - x_exact).max() < 1e-7
