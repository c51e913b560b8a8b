#!/usr/bin/env python3
"""DFG 2D-2 force-functional cross-check on the saturated monolithic state.

Round-4 verdict item 1: the monolithic res-3 arbiter saturates at
c_L,max = 0.978 (fit), 1.2% below the Schafer-Turek interval
[0.99, 1.01], with c_D/St/dP in-interval and dt/h/scheme/outflow each
ruled out.  The one untried lever is the FORCE EVALUATION itself: the
arbiter uses nodal reactions (SolverBase.boundary_reaction_force); the
reference demo assembles a boundary traction line integral with
tau = -p n + (1/Re) sym(grad u) . n (demo/dfg_benchmark.py:54-64 --
note: HALF the physical deviatoric stress 2 nu sym(grad u)).

This harness marches the committed saturated state
(benchmarks/states/dfg_2d2_mono_res3_t292.npz, t=295) a short window,
evaluating drag/lift FOUR ways every step:

  react : nodal reactions of the full momentum residual (incl. BDF
          inertia) summed over cylinder dofs -- the variational
          "superconvergent" evaluation, and the current arbiter metric
  trfR  : line integral, reference definition  -p n + nu sym(grad u) n
  trf2  : line integral, physical deviatoric    -p n + 2 nu sym(grad u) n
  trfG  : line integral, reduced-form-consistent -p n + nu (grad u) n
          (the natural traction of the nu grad(u):grad(w) weak form the
          monolithic solver discretizes)

All series columns carry the DFG factor 2 (c = 2F).  Results land under
benchmarks/states/ (committed path -- round-4 durability rule).

Usage:
  python benchmarks/dfg_force_xcheck.py [t_end] [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

import numpy as np

STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "states", "dfg_2d2_mono_res3_t292.npz")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "states", "dfg_2d2_force_xcheck_res3.txt")


def main(t_end):
    import jax.numpy as jnp

    from navierstokes_tpu import config
    from navierstokes_tpu.fem.bcs import VelocityBCType
    from navierstokes_tpu.mesh import channel_with_cylinder
    from navierstokes_tpu.solvers import ImplicitBDFSolver
    from navierstokes_tpu.timestepping import BDFTimeStepping

    resolution, dt, visc, h = 3.0, 0.005, 1.0 / 100.0, 4.1
    mesh, markers, bm = channel_with_cylinder(resolution, wake=1.0)

    def inlet(x):
        s = x[:, 1] / h
        return np.stack([6.0 * s * (1.0 - s), np.zeros(len(x))], axis=1)

    data = np.load(STATE)
    assert float(data["resolution"]) == resolution
    t0 = float(data["t"])

    ts = BDFTimeStepping(t0, t_end, desired_start_time_step=dt)
    solver = ImplicitBDFSolver(mesh, markers, "standard", ts, tol=1e-8,
                               linear_solver="frozen_lu")
    solver.set_boundary_conditions(
        ((VelocityBCType.function, bm["inlet"], inlet),
         (VelocityBCType.no_slip, bm["cylinder"], None),
         (VelocityBCType.no_slip, bm["upper wall"], None),
         (VelocityBCType.no_slip, bm["lower wall"], None)))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": visc,
         "pressure_term": 1.0, "coriolis_term": None,
         "euler_term": None, "body_force_term": None})
    solver.set_initial_conditions({"velocity": (0.0, 0.0)})
    space = solver.space
    dtp = config.default_dtype()
    x_now = np.concatenate([np.asarray(data["u"], np.float64),
                            np.asarray(data["p"], np.float64)])
    x_prev = np.concatenate([np.asarray(data["u_old"], np.float64),
                             np.asarray(data["p"], np.float64)])
    solver._solutions[0] = jnp.asarray(x_now, dtp)
    solver._solutions[1] = jnp.asarray(x_now, dtp)
    solver._solutions[2] = jnp.asarray(x_prev, dtp)

    op = solver._operator
    fids = markers.ids_with_value(bm["cylinder"])
    batch = space.facet_batch(fids)
    dev = op.facet_batch_device(batch)

    def traction_forces(u, p):
        """(F_ref, F_full, F_gradu), each the OUTWARD force on the
        cylinder = -integral(tau) dA over the cylinder boundary."""
        uu = u.reshape(-1, space.dim)
        # reference: -p n + nu D n, D = sym grad  (ns demo :54-61)
        f_ref = op.boundary_traction_force(dev, uu, p, visc)
        # viscous-only part nu D n (p=0) to form the 2*nu variant
        f_visc = op.boundary_traction_force(dev, uu, jnp.zeros_like(p), visc)
        f_full = f_ref + f_visc
        # reduced-form-consistent: -p n + nu (grad u) n
        g2 = jnp.einsum("fqia,fqae->fqie", dev["G2"], dev["Jinv"])
        grad_u = jnp.einsum("fid,fqie->fqde", uu[dev["cell_unodes"]], g2)
        p_q = jnp.einsum("fqj,fj->fq", dev["N1"], p[dev["cell_pnodes"]])
        n = dev["normals"]
        tau = (-p_q[:, :, None] * n
               + visc * jnp.einsum("fqde,fqe->fqd", grad_u, n))
        f_gradu = jnp.einsum("fq,fqd->d", dev["weights"], tau)
        return -f_ref, -f_full, -f_gradu

    print(f"xcheck: {space.n_dofs} DoF, resumed t={t0}", flush=True)
    series = []
    if os.path.exists(OUT):  # resume: keep rows at or before t0
        prev = np.loadtxt(OUT, ndmin=2)
        series = prev[prev[:, 0] <= t0 + 1e-9].tolist()

    tstart = time.time()
    n_steps = int(round((t_end - t0) / dt))
    for step_i in range(n_steps):
        ts.update_coefficients()
        solver.solve()
        fr = solver.boundary_reaction_force(bm["cylinder"])
        u, p = space.split(solver.solution)
        f1, f2, f3 = traction_forces(u, p)
        row = [ts.next_time] + [2.0 * float(v) for v in
                                (fr[0], fr[1], f1[0], f1[1],
                                 f2[0], f2[1], f3[0], f3[1])]
        series.append(row)
        ts.advance_time()
        solver.advance_time()
        if (step_i + 1) % 20 == 0:
            el = time.time() - tstart
            r = series[-1]
            print(f"t={r[0]:8.3f} cL react={r[2]:8.4f} trfR={r[4]:8.4f} "
                  f"trf2={r[6]:8.4f} trfG={r[8]:8.4f} "
                  f"[{el / (step_i + 1):.2f} s/step]", flush=True)
            np.savetxt(OUT, np.asarray(series))
    np.savetxt(OUT, np.asarray(series))

    arr = np.asarray(series)
    out = {"dofs": space.n_dofs, "t_end": float(arr[-1, 0]), "n": len(arr)}
    if arr[-1, 0] - arr[0, 0] > 6.5:       # >= 2 shedding periods
        from navierstokes_tpu.utils.signal import periodic_fit

        w = arr[arr[:, 0] > arr[-1, 0] - 6.7]
        for name, cd_col, cl_col in (("react", 1, 2), ("trfR", 3, 4),
                                     ("trf2", 5, 6), ("trfG", 7, 8)):
            fd = periodic_fit(w[:, 0], w[:, cd_col], K=8)
            fl = periodic_fit(w[:, 0], w[:, cl_col], K=8)
            out[name] = dict(cd_max=round(fd["max"], 4),
                             cl_max=round(fl["max"], 4),
                             cl_min=round(fl["min"], 4),
                             st=round(fl["freq"], 4))
    print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    if "--cpu" in sys.argv[1:]:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    main(float(args[0]) if args else 302.0)
