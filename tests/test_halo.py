"""Dof-partitioned halo-exchange operators (parallel/halo.py).

VERDICT round-1 weak #6: the cell-sharded layer psums full-length vectors
(per-device memory O(global dofs)).  Here every operator's 8-device result
must equal the single-device reference to roundoff, while per-device
storage is O(dofs/n_dev + halo) with halo << owned.
"""

import pytest

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


def _channel_setup():
    from navierstokes_tpu.fem.dirichlet import compile_dirichlet_bcs
    from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
    from navierstokes_tpu.mesh import hyper_rectangle
    from navierstokes_tpu.mesh.generators import HyperCubeBoundaryMarkers as M

    mesh, markers = hyper_rectangle((0.0, 0.0), (4.0, 1.0), (16, 4))
    space = TaylorHoodSpace(mesh)
    inlet = lambda x: np.stack([x[:, 1] * (1 - x[:, 1]),
                                np.zeros(len(x))], axis=1)
    vel_d, _ = compile_dirichlet_bcs(
        space, markers,
        ((VelocityBCType.function, M.left.value, inlet),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.no_slip, M.top.value, None)), ())
    pres_d, _ = compile_dirichlet_bcs(
        space, markers, (),
        ((PressureBCType.constant, M.right.value, 0.0),))
    vmask = np.zeros(space.n_velocity_dofs, bool)
    vmask[np.asarray(vel_d.dofs, np.int64)] = True
    vvals = np.zeros(space.n_velocity_dofs)
    vvals[np.asarray(vel_d.dofs, np.int64)] = np.asarray(vel_d.values(0.0))
    pmask = np.zeros(space.n_pnodes, bool)
    pmask[np.asarray(pres_d.dofs, np.int64) - space.pressure_offset] = True
    return space, (vmask, vvals), pmask


@pytest.mark.slow
def test_halo_projection_step_matches_single_device():
    """A full Dirichlet-BC projection step on sharded state must track the
    single-device fused step to roundoff at every device count (the
    round-2 verdict: the halo layer carried no solver and no BCs)."""
    from navierstokes_tpu.solvers.fused_step import build_projection_step
    from navierstokes_tpu.solvers.halo_step import build_halo_projection_step

    space, vel_bc, pmask = _channel_setup()
    kw = dict(visc=0.1, dt=0.02, cg_iters=(40, 200, 20),
              vel_bc=vel_bc, pres_bc_mask=pmask, cg_rtol=1e-13)

    ref_ops = ShardedCellOperator(space, device_mesh(1))
    step_ref = build_projection_step(space, ref_ops, **kw)

    dt64 = jnp.float64
    one = lambda v: jnp.asarray(v, dt64)
    alphas = [(one(1.0), one(-1.0), one(0.0)),
              (one(1.5), one(-2.0), one(0.5))]
    etas = [(one(1.0), one(0.0)), (one(2.0), one(-1.0))]

    u_r = jnp.zeros(space.n_velocity_dofs, dt64)
    p_r = jnp.zeros(space.n_pnodes, dt64)
    phi_r = jnp.zeros_like(p_r)
    ur_old = u_r
    for i in range(5):
        a, e = (alphas[0], etas[0]) if i == 0 else (alphas[1], etas[1])
        u_new, p_r, phi_r = step_ref(u_r, ur_old, p_r, phi_r, a, e)
        ur_old, u_r = u_r, u_new

    for ndev in (2, 8):
        ops = HaloCellOperator(space, device_mesh(ndev))
        step_h = build_halo_projection_step(ops, **kw)
        u = ops.pad_velocity(jnp.zeros(space.n_velocity_dofs, dt64))
        p = ops.pad_pressure(jnp.zeros(space.n_pnodes, dt64))
        phi = jnp.zeros_like(p)
        u_old = u
        for i in range(5):
            a, e = (alphas[0], etas[0]) if i == 0 else (alphas[1], etas[1])
            u_new, p, phi = step_h(u, u_old, p, phi, a, e)
            u_old, u = u, u_new
        got_u = np.asarray(ops.unpad_velocity(u))
        got_p = np.asarray(ops.unpad_pressure(p))
        np.testing.assert_allclose(got_u, np.asarray(u_r), atol=1e-9,
                                   err_msg=f"ndev={ndev}")
        np.testing.assert_allclose(got_p, np.asarray(p_r), atol=1e-8,
                                   err_msg=f"ndev={ndev}")


def test_halo_projection_step_periodic_mean_free():
    """Enclosed periodic flow: the mean-free gauge must act on real nodes
    only (padding slots stay zero)."""
    from navierstokes_tpu.fem.spaces import axis_periodic
    from navierstokes_tpu.solvers.fused_step import build_projection_step
    from navierstokes_tpu.solvers.halo_step import build_halo_projection_step

    mesh, _ = hyper_cube(2, 8)
    space = TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                            axis_periodic(1)])
    g = 2 * np.pi
    u0 = space.interpolate_velocity(
        lambda x: np.stack([np.cos(g * x[:, 0]) * np.sin(g * x[:, 1]),
                            -np.sin(g * x[:, 0]) * np.cos(g * x[:, 1])],
                           axis=1)).reshape(-1)
    p0 = space.interpolate_pressure(
        lambda x: -0.25 * (np.cos(2 * g * x[:, 0])
                           + np.cos(2 * g * x[:, 1])))
    kw = dict(visc=0.01, dt=1e-3, cg_iters=(12, 60, 8))

    ref_ops = ShardedCellOperator(space, device_mesh(1))
    step_ref = build_projection_step(space, ref_ops, **kw)

    dt64 = jnp.float64
    one = lambda v: jnp.asarray(v, dt64)
    a2 = (one(1.5), one(-2.0), one(0.5))
    e2 = (one(2.0), one(-1.0))

    u_r = jnp.asarray(u0)
    p_r = jnp.asarray(p0)
    phi_r = jnp.zeros_like(p_r)
    for _ in range(3):
        u_new, p_r, phi_r = step_ref(u_r, u_r, p_r, phi_r, a2, e2)
        u_r = u_new

    ops = HaloCellOperator(space, device_mesh(8))
    step_h = build_halo_projection_step(ops, **kw)
    u = ops.pad_velocity(jnp.asarray(u0))
    p = ops.pad_pressure(jnp.asarray(p0))
    phi = jnp.zeros_like(p)
    for _ in range(3):
        u_new, p, phi = step_h(u, u, p, phi, a2, e2)
        u = u_new
    np.testing.assert_allclose(np.asarray(ops.unpad_velocity(u)),
                               np.asarray(u_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ops.unpad_pressure(p)),
                               np.asarray(p_r), atol=1e-10)


def test_projection_solver_halo_product_api_matches_single_device():
    """VERDICT r2 item 2: an 8-device transient Dirichlet channel through
    the product solver API must match the single-device solve to roundoff.
    ``device_mesh=`` routes ProjectionSolver through the halo layer."""
    from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
    from navierstokes_tpu.mesh import hyper_rectangle
    from navierstokes_tpu.mesh.generators import \
        HyperCubeBoundaryMarkers as M
    from navierstokes_tpu.solvers import ProjectionSolver
    from navierstokes_tpu.timestepping import BDFTimeStepping

    def build(dmesh):
        mesh, markers = hyper_rectangle((0.0, 0.0), (4.0, 1.0), (16, 4))
        ts = BDFTimeStepping(0.0, 1.0, desired_start_time_step=0.02)
        solver = ProjectionSolver(mesh, markers, "standard", ts,
                                  cg_iters=(60, 400, 30), cg_rtol=1e-13,
                                  device_mesh=dmesh)
        inlet = lambda x: np.stack(
            [np.sin(np.pi * x[:, 1]), np.zeros(len(x))], axis=1)
        solver.set_boundary_conditions(
            ((VelocityBCType.function, M.left.value, inlet),
             (VelocityBCType.no_slip, M.bottom.value, None),
             (VelocityBCType.no_slip, M.top.value, None),
             (PressureBCType.constant, M.right.value, 0.0)))
        solver.set_equation_coefficients(
            {"convective_term": 1.0, "viscous_term": 0.1,
             "pressure_term": 1.0})
        solver.set_initial_conditions({"velocity": (0.0, 0.0)})
        return solver, ts

    def run(solver, ts, n):
        for _ in range(n):
            ts.update_coefficients()
            solver.solve()
            ts.advance_time()
            solver.advance_time()
        return np.asarray(solver.solution)

    s1, ts1 = build(None)
    x1 = run(s1, ts1, 6)
    assert s1._step_kind == "fast"

    s8, ts8 = build(device_mesh(8))
    x8 = run(s8, ts8, 6)
    assert s8._step_kind == "halo"
    np.testing.assert_allclose(x8, x1, atol=1e-9)
