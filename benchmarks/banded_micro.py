#!/usr/bin/env python3
"""Micro-benchmark of the banded (generic-path) projection step's pieces.

The generic path sustains ~26M DoF-steps/s at 128^2 (5.6 ms/step) while
the structured spectral path sustains ~580M on the same problem -- a 22x
gap that every non-periodic application pays (VERDICT r3 weak #2).  This
decomposes one step into its phases, timed in isolation inside jitted
scan chunks (so dispatch overhead cannot pollute the comparison), and
prints each phase's HBM-roofline estimate next to its measured time:

  * single operator applies (M, K, L, G/D couplings)
  * convection assembly (the only gather in the step)
  * one CG iteration's fixed overhead (matvec + 2 vdots + axpys)
  * the three sub-solves at the bench iteration counts (10, 60, 6)
  * the full step

Usage: python benchmarks/banded_micro.py [n] [reps]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd

import sys
import time

import numpy as np


def main(n=128, reps=100):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from navierstokes_tpu import config
    from navierstokes_tpu.assembly.fastop import FastTaylorHood, conv_apply
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace, axis_periodic
    from navierstokes_tpu.mesh import hyper_cube
    from navierstokes_tpu.solvers.planar_step import (
        _pcg, _step_core, build_planar_projection_step)

    mesh, _ = hyper_cube(2, n)
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

    def timeit(name, fn, arg, nbytes=None):
        @jax.jit
        def chunk(a):
            return lax.scan(lambda c, _: (fn(c), None), a, None,
                            length=reps)[0]

        out = chunk(arg)
        sync(out)
        t0 = time.perf_counter()
        out = chunk(arg)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        roof = "" if nbytes is None else \
            f"   (roofline ~{nbytes / 819e9 * 1e6:7.1f} us @819GB/s)"
        print(f"{name:34s} {dt * 1e6:9.1f} us{roof}")
        return dt

    def op_bytes(op, vec_elems, ncomp=1):
        # band read once + vector read ~once per offset is the worst
        # case; best case (perfect reuse) reads the vector once.  Use
        # band + 2x vector as the roofline estimate.
        return op.nbytes + 2 * vec_elems * itemsize * ncomp

    d = space.dim
    Nu, Np = space.n_unodes, space.n_pnodes
    print(f"n={n}: {space.n_dofs} DoF ({d}x{Nu} u + {Np} p), dtype={dtype}")
    for nm, op in [("M (P2 mass)", ops.M), ("K (P2 stiffness)", ops.K),
                   ("L (P1 laplacian)", ops.L)]:
        print(f"  {nm:22s} {type(op).__name__:14s} {op.nbytes / 1e6:8.2f} MB")

    timeit("M.apply (dim,Nu)", ops.M.apply, u, op_bytes(ops.M, Nu, d))
    timeit("K.apply (dim,Nu)", ops.K.apply, u, op_bytes(ops.K, Nu, d))
    timeit("L.apply (Np)", ops.L.apply, p, op_bytes(ops.L, Np))
    timeit("grad(div(u)) coupling roundtrip",
           lambda v: jnp.stack(
               [G.apply(sum(D.apply(v[i]) for i, D in enumerate(ops.D)))
                for G in ops.G], axis=0), u,
           sum(G.nbytes for G in ops.G) + sum(D.nbytes for D in ops.D)
           + 2 * Nu * itemsize * d)
    timeit("convection assembly", lambda v: conv_apply(ops, v, 1.0), u)

    def helm(v):
        return 1500.0 * ops.M.apply(v) + 0.01 * ops.K.apply(v)

    inv_mdiag = 1.0 / ops.diag_m
    inv_ldiag = jnp.where(jnp.abs(ops.diag_l) > 1e-30,
                          1.0 / jnp.where(jnp.abs(ops.diag_l) > 1e-30,
                                          ops.diag_l, 1.0), 1.0)

    def proj(r):
        return r - jnp.mean(r)

    t_h = timeit("helmholtz CG x10", lambda v: _pcg(
        helm, v, jnp.zeros_like(v), 10, inv_diag=inv_mdiag)[0], u)
    t_p = timeit("poisson CG x60", lambda q: _pcg(
        ops.L.apply, proj(q), jnp.zeros_like(q), 60, inv_diag=inv_ldiag,
        project=proj)[0], p)
    t_m = timeit("mass CG x6", lambda v: _pcg(
        ops.M.apply, v, jnp.zeros_like(v), 6, inv_diag=inv_mdiag)[0], u)
    t_1 = timeit("1 helmholtz CG iteration", lambda v: _pcg(
        helm, v, jnp.zeros_like(v), 1, inv_diag=inv_mdiag)[0], u)

    step = build_planar_projection_step(fast, visc=0.01, dt=1e-3,
                                        cg_iters=(10, 60, 6))
    al = tuple(jnp.asarray(v, dtype) for v in (1.5, -2.0, 0.5))
    et = tuple(jnp.asarray(v, dtype) for v in (2.0, -1.0))
    kk = jnp.asarray(1e-3, dtype)
    phi = jnp.zeros_like(p)

    @jax.jit
    def full_chunk(o, m, state):
        def body(c, _):
            uu, uo, pp, ff = c
            un, pn, fn = _step_core(o, m, uu, uo, pp, ff, al, et, None,
                                    kk, None, with_residuals=False,
                                    **step.static)
            return (un, uu, pn, fn), None

        return lax.scan(body, state, None, length=reps)[0]

    st = full_chunk(step.ops, step.masks, (u, u, p, phi))
    sync(st)
    t0 = time.perf_counter()
    st = full_chunk(step.ops, step.masks, st)
    sync(st)
    dt_full = (time.perf_counter() - t0) / reps
    print(f"{'FULL STEP':34s} {dt_full * 1e6:9.1f} us   "
          f"({space.n_dofs / dt_full / 1e6:.1f}M DoF-steps/s)")
    print(f"{'  sum of sub-solves':34s} "
          f"{(t_h + t_p + t_m) * 1e6:9.1f} us")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int(sys.argv[2]) if len(sys.argv) > 2 else 100)
