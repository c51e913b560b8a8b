#!/usr/bin/env python3
"""Micro-benchmark of the banded (generic-path) projection step's pieces.

The generic path sustains ~26M DoF-steps/s at 128^2 (5.6 ms/step) while
the structured spectral path sustains ~580M on the same problem -- a 22x
gap that every non-periodic application pays (VERDICT r3 weak #2).  This
decomposes one step into its phases, timed in isolation inside jitted
scan chunks, and prints each phase's HBM-roofline estimate next to its
measured time.

Methodology notes (tunnel-able): operators enter every jitted chunk as
ARGUMENTS (closures would inline the band arrays as HLO constants ->
remote-compile HTTP 413), and the rep count is high enough that the
per-dispatch tunnel round-trip (~tens of ms) amortizes below the
per-rep resolution.

Usage: python benchmarks/banded_micro.py [n] [reps]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd

import sys
import time
from functools import partial

import numpy as np


def main(n=128, reps=2000, dfg=False):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from navierstokes_tpu import config
    from navierstokes_tpu.assembly.fastop import FastTaylorHood, conv_apply
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace, axis_periodic
    from navierstokes_tpu.mesh import channel_with_cylinder, hyper_cube
    from navierstokes_tpu.solvers.planar_step import _pcg, _step_core, \
        build_planar_projection_step

    if dfg:
        # the shape real applications pay: unstructured curved cylinder
        # mesh -> AffineBand operators, Dirichlet masks, AMG Poisson
        mesh, markers, bm = channel_with_cylinder(float(n))
        space = TaylorHoodSpace(mesh)
    else:
        mesh, _ = hyper_cube(2, int(n))
        space = TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                                axis_periodic(1)])
    dtype = config.default_dtype()
    fast = FastTaylorHood(space)
    ops = fast.ops
    itemsize = jnp.dtype(dtype).itemsize

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.dim, space.n_unodes)), dtype)
    p = jnp.asarray(rng.standard_normal(space.n_pnodes), dtype)

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    @partial(jax.jit, static_argnames=("fn", "nrep"))
    def chunk(o, a, fn, nrep):
        return lax.scan(lambda c, _: (fn(o, c), None), a, None,
                        length=nrep)[0]

    def timeit(name, fn, arg, nbytes=None, nrep=reps):
        out = chunk(ops, arg, fn, nrep)
        sync(out)
        t0 = time.perf_counter()
        out = chunk(ops, arg, fn, nrep)
        sync(out)
        dt = (time.perf_counter() - t0) / nrep
        roof = "" if nbytes is None else \
            f"   (roofline ~{nbytes / 819e9 * 1e6:7.1f} us @819GB/s)"
        print(f"{name:34s} {dt * 1e6:9.1f} us{roof}", flush=True)
        return dt

    def op_bytes(op, vec_elems, ncomp=1):
        return op.nbytes + 2 * vec_elems * itemsize * ncomp

    d = space.dim
    Nu, Np = space.n_unodes, space.n_pnodes
    print(f"n={n}: {space.n_dofs} DoF ({d}x{Nu} u + {Np} p), "
          f"dtype={jnp.dtype(dtype).name}, reps={reps}, "
          f"circ_mode={getattr(ops.M, 'mode', '-')}", flush=True)
    for nm, op in [("M (P2 mass)", ops.M), ("K (P2 stiffness)", ops.K),
                   ("L (P1 laplacian)", ops.L)]:
        print(f"  {nm:22s} {type(op).__name__:14s} "
              f"{op.nbytes / 1e6:8.2f} MB", flush=True)

    timeit("M.apply (dim,Nu)", lambda o, v: o.M.apply(v), u,
           op_bytes(ops.M, Nu, d))
    timeit("K.apply (dim,Nu)", lambda o, v: o.K.apply(v), u,
           op_bytes(ops.K, Nu, d))
    timeit("L.apply (Np)", lambda o, q: o.L.apply(q), p,
           op_bytes(ops.L, Np))

    def graddiv(o, v):
        q = o.D[0].apply(v[0])
        for i in range(1, len(o.D)):
            q = q + o.D[i].apply(v[i])
        return jnp.stack([G.apply(q) for G in o.G], axis=0)

    timeit("grad(div(u)) coupling roundtrip", graddiv, u,
           sum(G.nbytes for G in ops.G) + sum(D.nbytes for D in ops.D)
           + 2 * Nu * itemsize * d)
    timeit("convection assembly",
           lambda o, v: conv_apply(o, v, 1.0), u, nrep=reps // 4)

    def conv_rowgather(o, v):
        # experiment: gather contiguous (d,)-rows of the interleaved
        # layout instead of strided planar elements
        ut = v.T                                             # (Nu, d)
        u_c = ut[o.conv_cu]                                  # (nc, 6, d)
        u_q = jnp.einsum("qi,cid->cqd", o.conv_N2, u_c)
        grad_u = jnp.einsum("cid,cqie->cqde", u_c, o.conv_g2)
        adv = jnp.einsum("cqe,cqde->cqd", u_q, grad_u)
        r_c = jnp.einsum("cq,cqd,qi->cid", o.conv_W, adv, o.conv_N2)
        flat = r_c.reshape(-1, v.shape[0])                   # (nc*6, d)
        pad = jnp.zeros((1, v.shape[0]), dtype=flat.dtype)
        padded = jnp.concatenate([flat, pad], axis=0)
        out = padded[o.conv_table].sum(axis=1)               # (Nu, d)
        return out.T

    timeit("convection (row-gather exp)", conv_rowgather, u,
           nrep=reps // 4)
    if fast.conv_strided is not None:
        timeit("convection (strided)",
               lambda o, v: conv_apply(o, v, 1.0,
                                       strided=fast.conv_strided),
               u, nrep=reps // 4)

    inv_mdiag = 1.0 / ops.diag_m
    inv_ldiag = jnp.where(jnp.abs(ops.diag_l) > 1e-30,
                          1.0 / jnp.where(jnp.abs(ops.diag_l) > 1e-30,
                                          ops.diag_l, 1.0), 1.0)

    def helm_solve(o, v, iters):
        def A(w):
            return 1500.0 * o.M.apply(w) + 0.01 * o.K.apply(w)

        return _pcg(A, v, jnp.zeros_like(v), iters,
                    inv_diag=inv_mdiag)[0]

    def pois_solve(o, q, iters):
        def proj(r):
            return r - jnp.mean(r)

        return _pcg(o.L.apply, proj(q), jnp.zeros_like(q), iters,
                    inv_diag=inv_ldiag, project=proj)[0]

    def mass_solve(o, v, iters):
        return _pcg(o.M.apply, v, jnp.zeros_like(v), iters,
                    inv_diag=inv_mdiag)[0]

    nr2 = reps // 10
    t_h = timeit("helmholtz CG x10",
                 partial(helm_solve, iters=10), u, nrep=nr2)
    t_p = timeit("poisson CG x60",
                 partial(pois_solve, iters=60), p, nrep=nr2)
    t_m = timeit("mass CG x6",
                 partial(mass_solve, iters=6), u, nrep=nr2)
    t_1 = timeit("helmholtz CG x1",
                 partial(helm_solve, iters=1), u, nrep=nr2)
    del t_1

    if dfg:
        import numpy as _np

        from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
        from navierstokes_tpu.fem.dirichlet import compile_dirichlet_bcs

        h = 4.1
        inlet = lambda x: _np.stack(
            [6.0 * (x[:, 1] / h) * (1.0 - x[:, 1] / h),
             _np.zeros(len(x))], axis=1)
        vbc, _ = compile_dirichlet_bcs(space, markers, [
            (VelocityBCType.function, bm["inlet"], inlet),
            (VelocityBCType.no_slip, bm["cylinder"], None),
            (VelocityBCType.no_slip, bm["upper wall"], None),
            (VelocityBCType.no_slip, bm["lower wall"], None)], [])
        pbc, _ = compile_dirichlet_bcs(space, markers, [], [
            (PressureBCType.constant, bm["outlet"], 0.0)])
        v_mask = _np.zeros(space.n_velocity_dofs, bool)
        v_mask[_np.asarray(vbc.dofs)] = True
        v_vals = _np.zeros(space.n_velocity_dofs)
        v_vals[_np.asarray(vbc.dofs)] = vbc.values()
        p_mask = _np.zeros(space.n_pnodes, bool)
        p_mask[_np.asarray(pbc.dofs) - space.pressure_offset] = True
        to_planar = lambda flat: _np.asarray(flat).reshape(
            space.n_unodes, space.dim).T[:, fast.permU]
        step = build_planar_projection_step(
            fast, visc=0.01, dt=5e-3, cg_iters=(18, 30, 10),
            vel_bc=(to_planar(v_mask), to_planar(v_vals)),
            pres_bc_mask=_np.asarray(p_mask)[fast.permP],
            poisson_precond="amg")
        # per-phase solve timings at the DFG iteration counts
        amg_fn = step.static["p_precond"]
        timeit("AMG V-cycle (1 apply)",
               lambda o, q: amg_fn(q), p, nrep=reps // 4)
    else:
        step = build_planar_projection_step(fast, visc=0.01, dt=1e-3,
                                            cg_iters=(10, 60, 6))
    al = tuple(jnp.asarray(v, dtype) for v in (1.5, -2.0, 0.5))
    et = tuple(jnp.asarray(v, dtype) for v in (2.0, -1.0))
    kk = jnp.asarray(1e-3, dtype)
    phi = jnp.zeros_like(p)

    @partial(jax.jit, static_argnames=("nrep",))
    def full_chunk(o, m, state, nrep):
        def body(c, _):
            uu, uo, pp, ff = c
            un, pn, fn = _step_core(o, m, uu, uo, pp, ff, al, et, None,
                                    kk, None, with_residuals=False,
                                    **step.static)
            return (un, uu, pn, fn), None

        return lax.scan(body, state, None, length=nrep)[0]

    nr3 = max(reps // 10, 50)
    st = full_chunk(step.ops, step.masks, (u, u, p, phi), nr3)
    sync(st)
    t0 = time.perf_counter()
    st = full_chunk(step.ops, step.masks, st, nr3)
    sync(st)
    dt_full = (time.perf_counter() - t0) / nr3
    print(f"{'FULL STEP':34s} {dt_full * 1e6:9.1f} us   "
          f"({space.n_dofs / dt_full / 1e6:.1f}M DoF-steps/s)")
    print(f"{'  sum of sub-solves':34s} "
          f"{(t_h + t_p + t_m) * 1e6:9.1f} us")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dfg"]
    main(float(args[0]) if len(args) > 0 else 128,
         int(args[1]) if len(args) > 1 else 2000,
         dfg="--dfg" in sys.argv[1:])
