#!/usr/bin/env python3
"""DFG 2D-2 unsteady cylinder benchmark via the fused projection step.

Runs the full Schafer-Turek 2D-2 configuration (Re=100 on the cylinder
diameter, t in [0, T], dt=0.005 -- reference demo/dfg_benchmark.py) with
the jitted SBDF-2 incremental projection scheme and Dirichlet masking.
Drag/lift are evaluated per step from the *monolithic* BDF-2 momentum
residual at the cylinder's constrained nodes (nodal reactions,
superconvergent).  Reports max/mean coefficients and the Strouhal number
from the lift signal over the final window.

Literature: c_D,max = 3.22-3.24, c_L,max = 0.99-1.01, St = 0.295-0.305.

Usage: python benchmarks/dfg_2d2.py [T_end] [resolution] [dt]
"""

import json
import os
import sys
import time

import numpy as np


def main(t_end=80.0, resolution=1.3, dt=0.005, resume=None):
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
    step_lean = build_projection_step(space, ops, visc=visc, dt=dt,
                                      cg_iters=(18, 250, 10),
                                      vel_bc=(v_mask, v_vals),
                                      pres_bc_mask=p_mask)

    # monolithic residual for reaction forces
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
        r_u = r[:n_u].reshape(-1, 2)
        return -r_u[cyl_nodes].sum(axis=0)

    # initial state: the (unstable) steady solution at Re=100, computed
    # with a Reynolds ramp, plus a small antisymmetric perturbation that
    # seeds the vortex-shedding instability -- this avoids the violent
    # impulsive-start pressure transient entirely
    from navierstokes_tpu.solvers import StationarySolver

    print("computing steady base flow (Reynolds ramp)...", flush=True)
    steady = StationarySolver(mesh, markers, tol=1e-10)
    steady.set_boundary_conditions(
        ((VelocityBCType.function, bm["inlet"], inlet),
         (VelocityBCType.no_slip, bm["cylinder"], None),
         (VelocityBCType.no_slip, bm["upper wall"], None),
         (VelocityBCType.no_slip, bm["lower wall"], None),
         (PressureBCType.constant, bm["outlet"], 0.0)))
    for Re in (20.0, 50.0, 100.0):
        steady.set_equation_coefficients(
            {"convective_term": 1.0, "viscous_term": 1.0 / Re,
             "pressure_term": 1.0, "coriolis_term": None,
             "euler_term": None, "body_force_term": None})
        steady.solve()
        print(f"  steady Re={Re} done", flush=True)
    u_steady, p_steady = space.split(steady.solution)

    dtype = config.default_dtype()
    coords = space.u_coords
    # seed the vortex-street mode: alternating transverse blobs along the
    # wake at the expected shedding wavelength U/f ~ 3.3 diameters
    wake_env = (np.exp(-((coords[:, 1] - 2.0) / 0.8) ** 2)
                * (coords[:, 0] > 2.5) * (coords[:, 0] < 16.0))
    street = np.sin(2.0 * np.pi * (coords[:, 0] - 2.5) / 3.3)
    perturb = np.zeros((space.n_unodes, 2))
    perturb[:, 1] = 0.25 * wake_env * street
    u = jnp.asarray(np.asarray(u_steady) + perturb, dtype=dtype).reshape(-1)
    u = jnp.where(jnp.asarray(v_mask), jnp.asarray(v_vals, dtype=dtype), u)
    p = jnp.asarray(p_steady, dtype=dtype)
    phi = jnp.zeros_like(p)
    if resume is not None:
        data = np.load(resume)
        assert float(data["resolution"]) == resolution
        u = jnp.asarray(data["u"], dtype=dtype)
        p = jnp.asarray(data["p"], dtype=dtype)
        phi = jnp.asarray(data["phi"], dtype=dtype)
    one = lambda v: jnp.asarray(v, dtype)
    a1 = (one(1.0), one(-1.0), one(0.0))
    e1 = (one(1.0), one(0.0))
    a2 = (one(1.5), one(-2.0), one(0.5))
    e2 = (one(2.0), one(-1.0))

    n_steps = int(round(t_end / dt))
    series = np.zeros((n_steps, 3))
    u_old = u
    t0 = time.time()
    for i in range(n_steps):
        a, e = (a1, e1) if i == 0 else (a2, e2)
        u_new, p, phi = step_lean(u, u_old, p, phi, a, e)
        F = reaction(u_new, p, u, u_old, [float(x) for x in a])
        series[i] = ((i + 1) * dt, 2.0 * float(F[0]), 2.0 * float(F[1]))
        u_old, u = u, u_new
        if (i + 1) % 2000 == 0:
            print(f"t={series[i, 0]:7.2f}  c_D={series[i, 1]:7.4f}  "
                  f"c_L={series[i, 2]:8.4f}  "
                  f"[{(time.time() - t0) / (i + 1) * 1e3:.1f} ms/step]",
                  flush=True)
        if not np.isfinite(series[i, 1]):
            print("diverged", flush=True)
            break

    os.makedirs("results", exist_ok=True)
    np.savetxt("results/dfg_2d2_coefficients.txt", series)
    np.savez("results/dfg_2d2_state.npz", u=np.asarray(u),
             u_old=np.asarray(u_old), p=np.asarray(p),
             phi=np.asarray(phi), t=n_steps * dt, resolution=resolution)

    # evaluate over the final window (shedding fully developed)
    window = series[series[:, 0] > t_end - 20.0]
    if len(window) > 100:
        cd_max = window[:, 1].max()
        cl_max = window[:, 2].max()
        cl = window[:, 2] - window[:, 2].mean()
        # Strouhal from the dominant lift frequency
        freqs = np.fft.rfftfreq(len(cl), d=dt)
        amp = np.abs(np.fft.rfft(cl))
        St = float(freqs[np.argmax(amp[1:]) + 1])
        result = {"cd_max": round(float(cd_max), 4),
                  "cl_max": round(float(cl_max), 4),
                  "strouhal": round(St, 4),
                  "dofs": space.n_dofs, "dt": dt, "t_end": t_end,
                  "lit_cd": [3.22, 3.24], "lit_cl": [0.99, 1.01],
                  "lit_st": [0.295, 0.305]}
        print(json.dumps(result))
    return series


if __name__ == "__main__":
    t_end = float(sys.argv[1]) if len(sys.argv) > 1 else 80.0
    res = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3
    dt = float(sys.argv[3]) if len(sys.argv) > 3 else 0.005
    main(t_end, res, dt)
