#!/usr/bin/env python3
"""Micro-benchmark of the spectral projection step's pieces on device.

The full 128^2 step sustains ~30M DoF-steps/s (~5 ms/step) -- roughly
25x above its HBM roofline and ~100x above its FLOP bound, so something
lowers badly.  This times each piece in isolation (scan chunks of the
piece, one dispatch per chunk) to find where the 5 ms goes: the DFT
matmuls, the per-mode 4x4 block einsums (MXU tile-padding suspects),
the convection stencils, or the elementwise solves.

Usage: python benchmarks/spectral_micro.py [n]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd

import sys
import time

import numpy as np


def main(n=128, reps=200):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from navierstokes_tpu import config
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace, axis_periodic
    from navierstokes_tpu.mesh import hyper_cube
    from navierstokes_tpu.structured import (PeriodicStructuredTH,
                                             SpectralOperators,
                                             StructuredConvection,
                                             build_spectral_projection_step)
    from navierstokes_tpu.structured.spectral import SplitC

    mesh, _ = hyper_cube(2, n)
    space = TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                            axis_periodic(1)])
    sgrid = PeriodicStructuredTH(space)
    dtype = config.default_dtype()
    ops = SpectralOperators(sgrid, jnp.dtype(dtype))
    conv = StructuredConvection(sgrid, dtype)

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal(
        (sgrid.n_uclass,) + sgrid.shape + (space.dim,)), dtype)
    Uh = ops.fwd_u(U)
    Ph = ops.fwd_p(jnp.asarray(rng.standard_normal(sgrid.shape), dtype))

    def sync(x):
        leaves = jax.tree.leaves(x)
        return float(np.asarray(leaves[0].sum()))

    def timeit(name, fn, arg):
        # iterate the piece inside one jitted scan so per-piece dispatch
        # overhead cannot pollute the comparison
        @jax.jit
        def chunk(a):
            return lax.scan(lambda c, _: (fn(c), None), a, None,
                            length=reps)[0]

        out = chunk(arg)
        sync(out)  # compile + run once
        t0 = time.perf_counter()
        out = chunk(arg)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt * 1e3:8.3f} ms")
        return dt

    one = jnp.asarray(1.0, dtype)
    a0k = jnp.asarray(1500.0, dtype)

    del one
    timeit("DFT roundtrip (fwd+inv)", lambda u: ops.inv_u(ops.fwd_u(u)), U)
    timeit("mass (4x4 block einsum)", ops.mass, Uh)
    timeit("helmholtz_solve (2 eig mm)",
           lambda z: ops.helmholtz_solve(a0k, 0.01, z), Uh)
    timeit("mass_solve (2 eig mm)", ops.mass_solve, Uh)
    timeit("grad+div (couplings)", lambda z: ops.grad(ops.div(z)), Uh)
    timeit("poisson_solve (elemwise)",
           lambda z: SplitC(ops.poisson_solve(z).re, z.im), Ph)
    timeit("convection (stencils)", lambda u: conv(u), U)

    step, init_state, _ = build_spectral_projection_step(
        sgrid, visc=0.01, dt=1e-3, dtype=dtype)
    u0 = rng.standard_normal(space.n_velocity_dofs)
    p0 = rng.standard_normal(space.n_pnodes)
    state = init_state(u0, u0, p0)
    al = tuple(jnp.asarray(v, dtype) for v in (1.5, -2.0, 0.5))
    et = tuple(jnp.asarray(v, dtype) for v in (2.0, -1.0))

    @jax.jit
    def full_chunk(big, s):
        return lax.scan(lambda c, _: (step.raw(big, c, al, et, None), None),
                        s, None, length=reps)[0]

    s = full_chunk(step.big_arrays, state)
    sync(s)
    t0 = time.perf_counter()
    s = full_chunk(step.big_arrays, state)
    sync(s)
    dt = (time.perf_counter() - t0) / reps
    print(f"{'FULL STEP':28s} {dt * 1e3:8.3f} ms   "
          f"({space.n_dofs / dt / 1e6:.1f}M DoF-steps/s)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
