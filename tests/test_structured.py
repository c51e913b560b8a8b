"""Structured class-grid fast path: stencil ops, spectral solves, full step.

Everything here is verified against the generic unstructured path (the
sharded element-loop operators), which itself is verified against the
reference semantics in test_parallel.py -- so agreement transitively pins
the structured path to the reference weak forms.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from navierstokes_tpu.fem.spaces import TaylorHoodSpace, axis_periodic
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.parallel.sharded import (ShardedCellOperator,
                                               device_mesh)
from navierstokes_tpu.structured import (NotStructured, PeriodicStructuredTH,
                                         SpectralOperators,
                                         StructuredConvection, apply_pp,
                                         apply_pu, apply_up, apply_uu,
                                         build_spectral_projection_step)

GAMMA = 2.0 * np.pi
N = 8


@pytest.fixture(scope="module")
def setup():
    mesh, _ = hyper_cube(2, N)
    space = TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                            axis_periodic(1)])
    sgrid = PeriodicStructuredTH(space)
    ops = ShardedCellOperator(space, device_mesh(1))
    return space, sgrid, ops


def _random(space, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal(space.n_velocity_dofs)
    p = rng.standard_normal(space.n_pnodes)
    return u, p


def test_class_grid_bijection(setup):
    space, sgrid, _ = setup
    u, p = _random(space)
    assert sgrid.u_rank.shape == (4, N, N)
    U = sgrid.u_to_grids(u)
    assert U.shape == (4, N, N, 2)
    assert np.array_equal(sgrid.grids_to_u(U), u)
    P = sgrid.p_to_grid(p)
    assert np.array_equal(sgrid.grid_to_p(P), p)


def test_not_structured_rejected():
    mesh, _ = hyper_cube(2, 4)
    space = TaylorHoodSpace(mesh)          # no periodicity -> boundary grids
    with pytest.raises(NotStructured):
        PeriodicStructuredTH(space)


def test_stencil_ops_match_unstructured(setup):
    space, sgrid, ops = setup
    u, p = _random(space)
    U = jnp.asarray(sgrid.u_to_grids(u))
    P = jnp.asarray(sgrid.p_to_grid(p))

    # velocity mass and stiffness (P2 -> P2, scalar taps per component)
    ref = np.asarray(ops.make_velocity_mass()(jnp.asarray(u)))
    got = sgrid.grids_to_u(np.asarray(apply_uu(sgrid.taps_uu(sgrid.M_tau),
                                               U)))
    assert np.allclose(got, ref, atol=1e-12)

    ref = np.asarray(ops.make_velocity_helmholtz(0.7)(jnp.asarray(u),
                                                      jnp.asarray(0.3)))
    got = 0.3 * apply_uu(sgrid.taps_uu(sgrid.M_tau), U) \
        + 0.7 * apply_uu(sgrid.taps_uu(sgrid.K_tau), U)
    assert np.allclose(sgrid.grids_to_u(np.asarray(got)), ref, atol=1e-12)

    # pressure gradient (P1 -> P2, vector taps)
    ref = np.asarray(ops.make_gradient()(jnp.asarray(p)))
    got = sgrid.grids_to_u(np.asarray(apply_up(sgrid.taps_up(sgrid.G_tau),
                                               P)))
    assert np.allclose(got, ref, atol=1e-12)

    # divergence (P2 -> P1)
    ref = np.asarray(ops.make_divergence()(jnp.asarray(u)))
    got = sgrid.grid_to_p(np.asarray(apply_pu(sgrid.taps_pu(sgrid.G_tau),
                                              U)))
    assert np.allclose(got, ref, atol=1e-12)

    # pressure Laplacian (P1 -> P1)
    ref = np.asarray(ops.make_pressure_stiffness()(jnp.asarray(p)))
    got = sgrid.grid_to_p(np.asarray(apply_pp(sgrid.taps_pp(sgrid.L_tau),
                                              P)))
    assert np.allclose(got, ref, atol=1e-12)


def test_convection_matches_unstructured(setup):
    space, sgrid, ops = setup
    u, _ = _random(space, seed=3)
    U = jnp.asarray(sgrid.u_to_grids(u))
    ref = np.asarray(ops.make_convection_rhs(1.0)(jnp.asarray(u)))
    conv = StructuredConvection(sgrid, jnp.float64)
    got = sgrid.grids_to_u(np.asarray(conv(U)))
    assert np.allclose(got, ref, atol=1e-12)


def test_spectral_symbols_match_stencils(setup):
    """FFT symbols agree with the (independently verified) stencil applies
    -- a roundtrip solve test alone cannot catch a wrong symbol."""
    space, sgrid, _ = setup
    sp = SpectralOperators(sgrid, jnp.float64)
    u, p = _random(space, seed=11)
    U = jnp.asarray(sgrid.u_to_grids(u))
    P = jnp.asarray(sgrid.p_to_grid(p))
    Uh, Ph = sp.fwd_u(U), sp.fwd_p(P)

    pairs = [
        (apply_uu(sgrid.taps_uu(sgrid.M_tau), U), sp.inv_u(sp.mass(Uh))),
        (apply_uu(sgrid.taps_uu(sgrid.K_tau), U),
         sp.inv_u(sp.stiffness(Uh))),
        (apply_up(sgrid.taps_up(sgrid.G_tau), P), sp.inv_u(sp.grad(Ph))),
        (apply_pu(sgrid.taps_pu(sgrid.G_tau), U), sp.inv_p(sp.div(Uh))),
    ]
    for ref, got in pairs:
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-11)


def test_spectral_solves_exact(setup):
    space, sgrid, _ = setup
    sp = SpectralOperators(sgrid, jnp.float64)
    u, p = _random(space, seed=5)
    U = jnp.asarray(sgrid.u_to_grids(u))
    Uh = sp.fwd_u(U)

    # Helmholtz: solve(0.4 M x + 0.1 K x) == x to machine precision
    MU = sp.mass(Uh)
    KU = sp.stiffness(Uh)
    H = type(MU)(0.4 * MU.re + 0.1 * KU.re, 0.4 * MU.im + 0.1 * KU.im)
    rec = sp.helmholtz_solve(jnp.asarray(0.4), 0.1, H)
    assert np.allclose(np.asarray(sp.inv_u(rec)), np.asarray(U), atol=1e-11)

    # mass solve
    rec = sp.mass_solve(sp.mass(Uh))
    assert np.allclose(np.asarray(sp.inv_u(rec)), np.asarray(U), atol=1e-11)

    # Poisson pseudo-inverse on mean-free data: solve(L p) == p
    P = jnp.asarray(sgrid.p_to_grid(p))
    P = P - jnp.mean(P)
    LP = apply_pp(sgrid.taps_pp(sgrid.L_tau), P)
    rec = sp.poisson_solve(sp.fwd_p(LP))
    assert np.allclose(np.asarray(sp.inv_p(rec)), np.asarray(P), atol=1e-10)


def test_spectral_step_matches_fused_step(setup):
    """The spectral step and the generic fused step integrate the same
    scheme; with the CG sweeps run to machine convergence they agree."""
    from navierstokes_tpu.solvers.fused_step import build_projection_step

    space, sgrid, ops = setup
    visc, dt = 0.01, 1e-2
    step_ref = build_projection_step(space, ops, visc=visc, dt=dt,
                                     cg_iters=(200, 400, 120))
    step_sp, init_state, read_state = build_spectral_projection_step(
        sgrid, visc=visc, dt=dt, dtype=jnp.float64)

    from test_parallel import tg_velocity

    u0 = space.interpolate_velocity(tg_velocity).reshape(-1)
    p0 = np.zeros(space.n_pnodes)

    dtyped = lambda v: jnp.asarray(v, jnp.float64)
    alpha1 = tuple(map(dtyped, (1.0, -1.0, 0.0)))
    alpha2 = tuple(map(dtyped, (1.5, -2.0, 0.5)))
    eta1 = tuple(map(dtyped, (1.0, 0.0)))
    eta2 = tuple(map(dtyped, (2.0, -1.0)))

    # reference path
    u, u_old, p = jnp.asarray(u0), jnp.asarray(u0), jnp.asarray(p0)
    phi = jnp.zeros_like(p)
    u_new, p, phi = step_ref(u, u_old, p, phi, alpha1, eta1)
    u_old, u = u, u_new
    for _ in range(3):
        u_new, p, phi = step_ref(u, u_old, p, phi, alpha2, eta2)
        u_old, u = u, u_new

    # spectral path
    state = init_state(u0, u0, p0)
    state = step_sp(state, alpha1, eta1)
    for _ in range(3):
        state = step_sp(state, alpha2, eta2)
    u_sp, p_sp = read_state(state)

    scale = np.abs(np.asarray(u)).max()
    assert np.allclose(u_sp, np.asarray(u), atol=1e-9 * scale)
    p_ref = np.asarray(p) - np.asarray(p).mean()
    assert np.allclose(p_sp - p_sp.mean(), p_ref, atol=1e-8)


def test_spectral_taylor_green_decay():
    """L2 error vs the analytic Taylor-Green solution at t=0.1 matches the
    bar of the generic fused step (test_parallel.py:97-131, same config)."""
    from navierstokes_tpu.assembly.operators import MixedOperator
    from test_parallel import tg_velocity

    mesh, _ = hyper_cube(2, 16)
    space = TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                            axis_periodic(1)])
    sgrid = PeriodicStructuredTH(space)
    Re, dt, n_steps = 100.0, 5e-3, 20
    step, init_state, read_state = build_spectral_projection_step(
        sgrid, visc=1.0 / Re, dt=dt, dtype=jnp.float64)

    u0 = space.interpolate_velocity(tg_velocity).reshape(-1)
    g = GAMMA
    p0 = -0.25 * (np.cos(2 * g * space.p_coords[:, 0])
                  + np.cos(2 * g * space.p_coords[:, 1]))
    state = init_state(u0, u0, p0 - p0.mean())

    dtyped = lambda v: jnp.asarray(v, jnp.float64)
    alpha1 = tuple(map(dtyped, (1.0, -1.0, 0.0)))
    alpha2 = tuple(map(dtyped, (1.5, -2.0, 0.5)))
    eta1 = tuple(map(dtyped, (1.0, 0.0)))
    eta2 = tuple(map(dtyped, (2.0, -1.0)))

    state = step(state, alpha1, eta1)
    for _ in range(n_steps - 1):
        state = step(state, alpha2, eta2)

    u_T, _ = read_state(state)
    t_end = n_steps * dt
    op = MixedOperator(space)
    err = op.l2_error_velocity(u_T.reshape(-1, 2),
                               lambda x: tg_velocity(x, t=t_end))
    assert err < 4e-3, err


# ---------------------------------------------------------------------------
# 3D: the same machinery on the Kuhn-tetrahedralized triply periodic box
# (8 node classes, 6 simplex congruence types, 8x8 spectral blocks)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup3d():
    mesh, _ = hyper_cube(3, 6)
    space = TaylorHoodSpace(mesh, periodic=[axis_periodic(a)
                                            for a in range(3)])
    sgrid = PeriodicStructuredTH(space)
    ops = ShardedCellOperator(space, device_mesh(1))
    return space, sgrid, ops


def test_3d_class_grid_structure(setup3d):
    space, sgrid, _ = setup3d
    assert sgrid.shape == (6, 6, 6)
    assert sgrid.n_uclass == 8 and sgrid.n_tau == 6
    u, p = _random(space)
    assert np.array_equal(sgrid.grids_to_u(sgrid.u_to_grids(u)), u)
    assert np.array_equal(sgrid.grid_to_p(sgrid.p_to_grid(p)), p)


def test_3d_ops_match_unstructured(setup3d):
    """Stencil, convection AND spectral applies against the (independently
    verified) unstructured element loop, plus the 8x8 eigenbasis
    Helmholtz solve to machine precision."""
    space, sgrid, ops = setup3d
    u, p = _random(space, seed=4)
    U = jnp.asarray(sgrid.u_to_grids(u))
    P = jnp.asarray(sgrid.p_to_grid(p))

    pairs = [
        (apply_uu(sgrid.taps_uu(sgrid.M_tau), U),
         ops.make_velocity_mass()(jnp.asarray(u)), "u"),
        (apply_up(sgrid.taps_up(sgrid.G_tau), P),
         ops.make_gradient()(jnp.asarray(p)), "u"),
        (apply_pu(sgrid.taps_pu(sgrid.G_tau), U),
         ops.make_divergence()(jnp.asarray(u)), "p"),
        (apply_pp(sgrid.taps_pp(sgrid.L_tau), P),
         ops.make_pressure_stiffness()(jnp.asarray(p)), "p"),
        (StructuredConvection(sgrid, jnp.float64)(U),
         ops.make_convection_rhs(1.0)(jnp.asarray(u)), "u"),
    ]
    sp = SpectralOperators(sgrid, jnp.float64)
    Uh, Ph = sp.fwd_u(U), sp.fwd_p(P)
    pairs += [
        (sp.inv_u(sp.mass(Uh)),
         ops.make_velocity_mass()(jnp.asarray(u)), "u"),
        (sp.inv_u(sp.grad(Ph)), ops.make_gradient()(jnp.asarray(p)), "u"),
        (sp.inv_p(sp.div(Uh)), ops.make_divergence()(jnp.asarray(u)), "p"),
    ]
    for got, ref, kind in pairs:
        flat = sgrid.grids_to_u(np.asarray(got)) if kind == "u" \
            else sgrid.grid_to_p(np.asarray(got))
        assert np.allclose(flat, np.asarray(ref), atol=1e-12)

    B = apply_uu(sgrid.taps_uu(sgrid.M_tau), U)
    X = jnp.asarray(sp.inv_u(sp.helmholtz_solve(
        jnp.asarray(2.0), 0.3, sp.fwd_u(jnp.asarray(B)))))
    resid = 2.0 * apply_uu(sgrid.taps_uu(sgrid.M_tau), X) \
        + 0.3 * apply_uu(sgrid.taps_uu(sgrid.K_tau), X) - B
    assert float(jnp.abs(resid).max()) < 1e-12


def test_3d_spectral_step_matches_fused_step(setup3d):
    """Full 3D projection steps: spectral vs the generic fused step with
    deep CG -- same scheme, must agree."""
    from navierstokes_tpu.solvers.fused_step import build_projection_step

    space, sgrid, ops = setup3d
    visc, dt = 0.01, 1e-2
    step_ref = build_projection_step(space, ops, visc=visc, dt=dt,
                                     cg_iters=(200, 500, 120))
    step_sp, init_state, read_state = build_spectral_projection_step(
        sgrid, visc=visc, dt=dt, dtype=jnp.float64)

    u0 = space.interpolate_velocity(
        lambda x: np.stack(
            [np.sin(GAMMA * x[:, 1]) * np.cos(GAMMA * x[:, 2]),
             np.sin(GAMMA * x[:, 2]) * np.cos(GAMMA * x[:, 0]),
             np.sin(GAMMA * x[:, 0]) * np.cos(GAMMA * x[:, 1])],
            axis=1)).reshape(-1)
    p0 = np.zeros(space.n_pnodes)

    dtyped = lambda v: jnp.asarray(v, jnp.float64)
    alpha1 = tuple(map(dtyped, (1.0, -1.0, 0.0)))
    alpha2 = tuple(map(dtyped, (1.5, -2.0, 0.5)))
    eta1 = tuple(map(dtyped, (1.0, 0.0)))
    eta2 = tuple(map(dtyped, (2.0, -1.0)))

    u, u_old, p = jnp.asarray(u0), jnp.asarray(u0), jnp.asarray(p0)
    phi = jnp.zeros_like(p)
    u_new, p, phi = step_ref(u, u_old, p, phi, alpha1, eta1)
    u_old, u = u, u_new
    for _ in range(2):
        u_new, p, phi = step_ref(u, u_old, p, phi, alpha2, eta2)
        u_old, u = u, u_new

    state = init_state(u0, u0, p0)
    state = step_sp(state, alpha1, eta1)
    for _ in range(2):
        state = step_sp(state, alpha2, eta2)
    u_sp, p_sp = read_state(state)

    scale = np.abs(np.asarray(u)).max()
    assert np.allclose(u_sp, np.asarray(u), atol=1e-8 * scale)
    p_ref = np.asarray(p) - np.asarray(p).mean()
    assert np.allclose(p_sp - p_sp.mean(), p_ref, atol=1e-7)


def test_scan_chunk_matches_dispatch(setup):
    """lax.scan over ``step.raw`` (the bench.py / production-harness loop,
    big arrays passed as arguments) reproduces per-step dispatch exactly."""
    import jax
    from jax import lax

    space, sgrid, _ = setup
    step, init_state, _ = build_spectral_projection_step(
        sgrid, visc=0.01, dt=1e-2, dtype=jnp.float64)

    from test_parallel import tg_velocity

    u0 = space.interpolate_velocity(tg_velocity).reshape(-1)
    p0 = np.zeros(space.n_pnodes)
    dtyped = lambda v: jnp.asarray(v, jnp.float64)
    alpha2 = tuple(map(dtyped, (1.5, -2.0, 0.5)))
    eta2 = tuple(map(dtyped, (2.0, -1.0)))

    state_a = init_state(u0, u0, p0)
    for _ in range(5):
        state_a = step(state_a, alpha2, eta2)

    @jax.jit
    def chunk(big, state):
        body = lambda s, _: (step.raw(big, s, alpha2, eta2, None), None)
        return lax.scan(body, state, None, length=5)[0]

    state_b = chunk(step.big_arrays, init_state(u0, u0, p0))
    for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
