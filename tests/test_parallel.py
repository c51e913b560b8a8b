"""Sharded operators and the fused projection step.

Runs on the 8-virtual-device CPU mesh from conftest: verifies that the
sharded matvecs agree with the reference (single-device, quadrature-loop)
operators, that sharding is invariant in the device count, and that the
fused SBDF2 projection step tracks the analytic Taylor-Green decay.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from navierstokes_tpu.assembly.operators import (MixedOperator,
                                                 PressurePoissonOperator,
                                                 VelocityOperator)
from navierstokes_tpu.fem.spaces import TaylorHoodSpace, axis_periodic
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.parallel.sharded import (ShardedCellOperator,
                                               device_mesh)
from navierstokes_tpu.solvers.fused_step import build_projection_step

GAMMA = 2.0 * np.pi


def tg_velocity(x, t=0.0, Re=100.0):
    d = np.exp(-2 * GAMMA ** 2 * t / Re)
    return d * np.stack([np.cos(GAMMA * x[:, 0]) * np.sin(GAMMA * x[:, 1]),
                         -np.sin(GAMMA * x[:, 0]) * np.cos(GAMMA * x[:, 1])],
                        axis=1)


@pytest.fixture(scope="module")
def tg_space():
    mesh, _ = hyper_cube(2, 8)
    return TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                           axis_periodic(1)])


def _random_state(space, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal(space.n_velocity_dofs))
    p = jnp.asarray(rng.standard_normal(space.n_pnodes))
    return u, p


def test_sharded_matvecs_match_reference(tg_space):
    space = tg_space
    u, p = _random_state(space)

    ops8 = ShardedCellOperator(space, device_mesh(8))
    vop = VelocityOperator(space)
    pop = PressurePoissonOperator(space)
    mop = MixedOperator(space)

    # velocity mass
    ref = vop.mass_matvec(u)
    assert np.allclose(ops8.make_velocity_mass()(u), ref, atol=1e-11)
    # pressure stiffness
    assert np.allclose(ops8.make_pressure_stiffness()(p),
                       pop.stiffness_matvec(p), atol=1e-11)
    # divergence coupling: D u = -int(div u) q
    div_u = jnp.trace(mop.grad_u_at_quad(u.reshape(-1, 2)),
                      axis1=2, axis2=3)
    ref_div = -pop.rhs_scalar(div_u)
    assert np.allclose(ops8.make_divergence()(u), ref_div, atol=1e-11)
    # helmholtz = accel0 * M + visc * K
    helm = ops8.make_velocity_helmholtz(0.3)(u, 2.0)
    K_u = helm - 2.0 * vop.mass_matvec(u)
    # check against quadrature-loop stiffness via grad-grad integral
    g = mop.grad_u_at_quad(u.reshape(-1, 2))
    energy = float(jnp.sum(mop.W * jnp.sum(g * g, axis=(2, 3))))
    assert np.isclose(float(jnp.vdot(u, K_u)), 0.3 * energy)


def test_sharding_invariance(tg_space):
    space = tg_space
    u, _ = _random_state(space, seed=3)
    r1 = ShardedCellOperator(space, device_mesh(1)).make_velocity_mass()(u)
    r4 = ShardedCellOperator(space, device_mesh(4)).make_velocity_mass()(u)
    r8 = ShardedCellOperator(space, device_mesh(8)).make_velocity_mass()(u)
    assert np.allclose(r1, r4, atol=1e-12)
    assert np.allclose(r1, r8, atol=1e-12)


def test_gradient_divergence_adjoint(tg_space):
    """<G p, u> == <p, D u> (discrete adjoint pair)."""
    space = tg_space
    u, p = _random_state(space, seed=5)
    ops = ShardedCellOperator(space, device_mesh(2))
    Gp = ops.make_gradient()(p)
    Du = ops.make_divergence()(u)
    assert np.isclose(float(jnp.vdot(Gp, u)), float(jnp.vdot(p, Du)))


def test_fused_projection_step_taylor_green():
    mesh, _ = hyper_cube(2, 16)
    space = TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                            axis_periodic(1)])
    Re, dt = 100.0, 5e-3
    ops = ShardedCellOperator(space, device_mesh(4))
    step = build_projection_step(space, ops, visc=1.0 / Re, dt=dt,
                                 cg_iters=(30, 60, 15))

    u = jnp.asarray(space.interpolate_velocity(
        lambda x: tg_velocity(x)).reshape(-1))
    p = jnp.asarray(space.interpolate_pressure(
        lambda x: -0.25 * (np.cos(2 * GAMMA * x[:, 0])
                           + np.cos(2 * GAMMA * x[:, 1]))))
    one = lambda v: jnp.asarray(v, u.dtype)
    a1 = (one(1.0), one(-1.0), one(0.0))
    e1 = (one(1.0), one(0.0))
    a2 = (one(1.5), one(-2.0), one(0.5))
    e2 = (one(2.0), one(-1.0))

    phi = jnp.zeros_like(p)
    u_old = u
    u_new, p, phi = step(u, u_old, p, phi, a1, e1)
    u_old, u = u, u_new
    n_steps = 20
    for _ in range(n_steps - 1):
        u_new, p, phi = step(u, u_old, p, phi, a2, e2)
        u_old, u = u, u_new

    t = n_steps * dt
    op = MixedOperator(space)
    err = op.l2_error_velocity(u.reshape(-1, 2),
                               lambda x: tg_velocity(x, t))
    assert err < 4e-3, err
    assert bool(jnp.all(jnp.isfinite(u)))


def test_masked_fused_step_channel_steady():
    """Dirichlet-masked fused step drives the channel to exact Poiseuille."""
    from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
    from navierstokes_tpu.fem.dirichlet import compile_dirichlet_bcs
    from navierstokes_tpu.mesh import HyperRectangleBoundaryMarkers as RM
    from navierstokes_tpu.mesh import hyper_rectangle

    mesh, markers = hyper_rectangle((0.0, 0.0), (5.0, 1.0), (20, 4))
    space = TaylorHoodSpace(mesh)
    inlet = lambda x: np.stack([6 * x[:, 1] * (1 - x[:, 1]),
                                np.zeros(len(x))], axis=1)
    vbc, _ = compile_dirichlet_bcs(space, markers, [
        (VelocityBCType.function, RM.left.value, inlet),
        (VelocityBCType.no_slip, RM.bottom.value, None),
        (VelocityBCType.no_slip, RM.top.value, None)], [])
    pbc, _ = compile_dirichlet_bcs(space, markers, [], [
        (PressureBCType.constant, RM.right.value, 0.0)])
    n_u = space.n_velocity_dofs
    v_mask = np.zeros(n_u, bool)
    v_mask[np.asarray(vbc.dofs)] = True
    v_vals = np.zeros(n_u)
    v_vals[np.asarray(vbc.dofs)] = vbc.values()
    p_mask = np.zeros(space.n_pnodes, bool)
    p_mask[np.asarray(pbc.dofs) - space.pressure_offset] = True

    ops = ShardedCellOperator(space, device_mesh(2))
    visc = 0.1
    step = build_projection_step(space, ops, visc=visc, dt=0.02,
                                 cg_iters=(15, 60, 10),
                                 vel_bc=(v_mask, v_vals),
                                 pres_bc_mask=p_mask)
    u = jnp.zeros(n_u)
    p = jnp.zeros(space.n_pnodes)
    phi = jnp.zeros_like(p)
    one = lambda v: jnp.asarray(v, u.dtype)
    a1 = (one(1.0), one(-1.0), one(0.0))
    e1 = (one(1.0), one(0.0))
    a2 = (one(1.5), one(-2.0), one(0.5))
    e2 = (one(2.0), one(-1.0))
    uo = u
    un, p, phi = step(u, uo, p, phi, a1, e1)
    uo, u = u, un
    for _ in range(200):
        un, p, phi = step(u, uo, p, phi, a2, e2)
        uo, u = u, un
    op = MixedOperator(space)
    err = op.l2_error_velocity(u.reshape(-1, 2), inlet)
    perr = op.l2_error_pressure(p, lambda x: 12 * visc * (5.0 - x[:, 0]))
    assert err < 1e-8, err
    assert perr < 1e-7, perr
