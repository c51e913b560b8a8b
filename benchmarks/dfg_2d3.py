#!/usr/bin/env python3
"""DFG 2D-3 benchmark: pulsating inflow past the cylinder, Re(t) in [0,100].

Schafer-Turek 2D-3: the 2D-2 geometry with inflow amplitude sin(pi t/8)
over one period (dimensional t in [0, 8] s; nondimensionalized by the
cylinder diameter and peak mean velocity: t* in [0, 80], amplitude
sin(pi t*/80)).  Literature: c_D,max = 2.93-2.97, c_L,max = 0.47-0.49.

Exercises the traced (time-dependent) velocity BC path of the fused
projection step.  Usage: python benchmarks/dfg_2d3.py [resolution] [dt]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd

import json
import os
import sys
import time

import numpy as np

T_END = 80.0


def main(resolution=1.8, dt=0.02):
    import jax
    import jax.numpy as jnp

    from navierstokes_tpu import config
    from navierstokes_tpu.assembly.operators import MixedOperator
    from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
    from navierstokes_tpu.fem.dirichlet import compile_dirichlet_bcs
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace
    from navierstokes_tpu.mesh import channel_with_cylinder
    from navierstokes_tpu.parallel.sharded import (ShardedCellOperator,
                                                   device_mesh)
    from navierstokes_tpu.solvers.fused_step import build_projection_step

    mesh, markers, bm = channel_with_cylinder(resolution)
    space = TaylorHoodSpace(mesh)
    print(f"cells={mesh.n_cells}, dofs={space.n_dofs}", flush=True)
    h = 4.1
    visc = 1.0 / 100.0

    def inlet(x):
        s = x[:, 1] / h
        return np.stack([6.0 * s * (1.0 - s), np.zeros(len(x))], axis=1)

    vbc, _ = compile_dirichlet_bcs(space, markers, [
        (VelocityBCType.function, bm["inlet"], inlet),
        (VelocityBCType.no_slip, bm["cylinder"], None),
        (VelocityBCType.no_slip, bm["upper wall"], None),
        (VelocityBCType.no_slip, bm["lower wall"], None)], [])
    pbc, _ = compile_dirichlet_bcs(space, markers, [], [
        (PressureBCType.constant, bm["outlet"], 0.0)])

    n_u = space.n_velocity_dofs
    v_mask = np.zeros(n_u, bool)
    v_mask[np.asarray(vbc.dofs)] = True
    v_vals = np.zeros(n_u)
    v_vals[np.asarray(vbc.dofs)] = vbc.values()
    p_mask = np.zeros(space.n_pnodes, bool)
    p_mask[np.asarray(pbc.dofs) - space.pressure_offset] = True

    ops = ShardedCellOperator(space, device_mesh(1))
    step = build_projection_step(space, ops, visc=visc, dt=dt,
                                 cg_iters=(18, 250, 10),
                                 vel_bc=(v_mask, v_vals),
                                 pres_bc_mask=p_mask)

    mop = MixedOperator(space)
    mop.set_bc_dofs(np.empty(0, dtype=np.int32))
    cyl_nodes = np.asarray(space.facet_unodes(
        markers.ids_with_value(bm["cylinder"])))
    zeros0 = jnp.zeros(0, dtype=config.default_dtype())

    @jax.jit
    def reaction(u, p, u_n, u_nm1, a):
        scalars = {"cc": 1.0, "cv": visc, "cp": 1.0, "accel0": a[0] / dt}
        hist = (a[1] / dt) * mop.u_at_quad(u_n.reshape(-1, 2)) \
            + (a[2] / dt) * mop.u_at_quad(u_nm1.reshape(-1, 2))
        x = jnp.concatenate([u, p])
        r = mop.residual(x, zeros0, scalars, hist, mask_bcs=False)
        return -r[:n_u].reshape(-1, 2)[cyl_nodes].sum(axis=0)

    dtype = config.default_dtype()
    v_vals_dev = jnp.asarray(v_vals, dtype=dtype)
    u = jnp.zeros(n_u, dtype=dtype)      # inflow starts at zero amplitude
    p = jnp.zeros(space.n_pnodes, dtype=dtype)
    phi = jnp.zeros_like(p)
    one = lambda v: jnp.asarray(v, dtype)
    a1 = (one(1.0), one(-1.0), one(0.0))
    e1 = (one(1.0), one(0.0))
    a2 = (one(1.5), one(-2.0), one(0.5))
    e2 = (one(2.0), one(-1.0))

    n_steps = int(round(T_END / dt))
    series = np.zeros((n_steps, 3))
    u_old = u
    t0 = time.time()
    for i in range(n_steps):
        t_next = (i + 1) * dt
        amp = np.sin(np.pi * t_next / T_END)
        a, e = (a1, e1) if i == 0 else (a2, e2)
        u_new, p, phi = step(u, u_old, p, phi, a, e,
                             bc_values=amp * v_vals_dev)
        F = reaction(u_new, p, u, u_old, [float(x) for x in a])
        series[i] = (t_next, 2.0 * float(F[0]), 2.0 * float(F[1]))
        u_old, u = u, u_new
        if (i + 1) % 500 == 0:
            print(f"t={t_next:7.2f}  c_D={series[i, 1]:7.4f}  "
                  f"c_L={series[i, 2]:8.4f}  "
                  f"[{(time.time() - t0) / (i + 1) * 1e3:.1f} ms/step]",
                  flush=True)
        if not np.isfinite(series[i, 1]):
            print("diverged", flush=True)
            break

    os.makedirs("results", exist_ok=True)
    np.savetxt("results/dfg_2d3_coefficients.txt", series)
    cd_max = float(series[:, 1].max())
    cl_max = float(series[:, 2].max())
    t_cd = float(series[np.argmax(series[:, 1]), 0])
    # end-of-period pressure difference dP(t=8s), i.e. t*=80: exact P1
    # interpolation at the front/back stagnation points (mesh vertices)
    dp_end = space.eval_pressure(np.asarray(p), [[1.5, 2.0], [2.5, 2.0]])
    result = {"cd_max": round(cd_max, 4), "cl_max": round(cl_max, 4),
              "t_cd_max": round(t_cd, 3), "dofs": space.n_dofs, "dt": dt,
              "dP_end": round(float(dp_end[0] - dp_end[1]), 4),
              "lit_cd": [2.93, 2.97], "lit_cl": [0.47, 0.49],
              "lit_dP_end": [-0.115, -0.105]}
    print(json.dumps(result))
    return series


if __name__ == "__main__":
    res = float(sys.argv[1]) if len(sys.argv) > 1 else 1.8
    dt = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    main(res, dt)
