"""Benchmark: Taylor-Green vortex, fused semi-implicit projection steps.

Measures sustained DoF-steps/sec (assembly + solve, everything inside one
XLA program per step) on the default accelerator -- the BASELINE.json
metric.  The configuration matches the reference's accuracy north-star
(Taylor-Green, Re=100, periodic Taylor-Hood P2/P1,
convergence_test/taylor_green_vortex.py) on a 128^2 mesh (~148k DoF).

Default path: the structured class-grid fast path
(navierstokes_tpu/structured/) -- stencil convection assembly plus *exact*
DFT block-diagonal solves (machine-precision Helmholtz/Poisson/mass
solves, strictly more accurate than the reference's per-step contract).
``NS_BENCH_PATH=generic`` benches the unstructured gather/scatter path
instead (any-mesh capable, what DFG runs on).

The reference publishes no throughput numbers (no benchmarks/ directory,
no timing code; see SURVEY.md par.6).  ``BASELINE_DOF_STEPS_PER_SEC`` is
the documented proxy: FEniCS assembly + sparse-direct solves on a
workstation CPU sustain O(0.5s)/step at this size, i.e. ~3e5 DoF-steps/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_DOF_STEPS_PER_SEC = 3.0e5
N_POINTS = int(os.environ.get("NS_BENCH_N", "128"))
N_STEPS = int(os.environ.get("NS_BENCH_STEPS", "200"))
PATH = os.environ.get("NS_BENCH_PATH", "structured")
RE = 100.0
DT = 1.0e-3


def _bench_structured(space, u0, p0):
    import jax
    import jax.numpy as jnp

    from navierstokes_tpu.structured import (PeriodicStructuredTH,
                                             build_spectral_projection_step)

    dtype = jnp.float64 if jax.config.read("jax_enable_x64") \
        else jnp.float32
    sgrid = PeriodicStructuredTH(space)
    step, init_state, _ = build_spectral_projection_step(
        sgrid, visc=1.0 / RE, dt=DT, dtype=dtype)

    state = jax.device_put(init_state(u0.reshape(-1), u0.reshape(-1), p0))
    one = lambda v: jnp.asarray(v, dtype)
    alpha1 = (one(1.0), one(-1.0), one(0.0))
    alpha2 = (one(1.5), one(-2.0), one(0.5))
    eta1 = (one(1.0), one(0.0))
    eta2 = (one(2.0), one(-1.0))

    state = step(state, alpha1, eta1)
    for _ in range(3):
        state = step(state, alpha2, eta2)
    jax.block_until_ready(state[0])

    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state = step(state, alpha2, eta2)
    jax.block_until_ready(state[0])
    elapsed = time.perf_counter() - t0
    finite = bool(jnp.all(jnp.isfinite(state[0])))
    return elapsed, finite, "spectral-structured"


def _bench_generic(space, u0, p0):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_step
    from navierstokes_tpu.parallel.sharded import device_mesh

    step = _build_step(space, device_mesh(1), dt=DT, visc=1.0 / RE,
                       cg_iters=(10, 30, 6))
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") \
        else jnp.float32
    u = jax.device_put(jnp.asarray(u0.reshape(-1), dtype=dtype))
    p = jax.device_put(jnp.asarray(p0, dtype=dtype))
    one = lambda v: jnp.asarray(v, dtype)
    alpha1 = (one(1.0), one(-1.0), one(0.0))
    alpha2 = (one(1.5), one(-2.0), one(0.5))
    eta1 = (one(1.0), one(0.0))
    eta2 = (one(2.0), one(-1.0))

    phi = jnp.zeros_like(p)
    u_old = u
    u_new, p, phi = step(u, u_old, p, phi, alpha1, eta1)
    u_old, u = u, u_new
    for _ in range(3):
        u_new, p, phi = step(u, u_old, p, phi, alpha2, eta2)
        u_old, u = u, u_new
    jax.block_until_ready(u)

    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        u_new, p, phi = step(u, u_old, p, phi, alpha2, eta2)
        u_old, u = u, u_new
    jax.block_until_ready(u)
    elapsed = time.perf_counter() - t0
    finite = bool(jnp.all(jnp.isfinite(u)))
    return elapsed, finite, "generic-unstructured"


def main():
    from __graft_entry__ import _taylor_green_setup

    space, u0, p0 = _taylor_green_setup(N_POINTS)
    if PATH not in ("structured", "generic"):
        raise SystemExit(f"NS_BENCH_PATH={PATH!r}: expected 'structured' "
                         "or 'generic'")
    bench = _bench_structured if PATH == "structured" else _bench_generic
    elapsed, finite, label = bench(space, u0, p0)

    steps_per_sec = N_STEPS / elapsed if finite else 0.0
    value = steps_per_sec * space.n_dofs

    print(json.dumps({
        "metric": "DoF-steps/sec (assembly+solve, Taylor-Green "
                  f"{N_POINTS}x{N_POINTS} SBDF2 projection, {label})",
        "value": round(value, 1),
        "unit": "dof*steps/s",
        "vs_baseline": round(value / BASELINE_DOF_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
