#!/usr/bin/env python3
"""DFG 2D-2 through the MONOLITHIC BDF-2 solver (reference-equivalent).

The split-scheme chains (benchmarks/dfg_2d2.py) converge to c_L,max ~=
0.969 independent of h, dt and the pressure-update variant, ~2% below
the Schafer-Turek interval, while c_D/St/dP are in-interval — and the
L32/Neumann outflow experiments show the amplitude is outflow-condition
sensitive.  This script is the apples-to-apples arbiter: the SAME mesh
and saturated state marched by the fully implicit monolithic BDF-2
solver with the reference's do-nothing outflow (no outlet BC at all —
the natural condition of the -(p, div v) weak form, exactly
/root/reference/demo/dfg_benchmark.py:21-44), forces by nodal reactions.
If the monolithic cycle lands at the literature amplitude, the deficit
is the split scheme's outflow/pressure treatment, not the
discretization.

Usage: python benchmarks/dfg_monolithic.py <resume.npz> [t_end] [resolution] [dt] [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from any cwd

import json
import os
import sys
import time

import numpy as np


def main(resume, t_end, resolution=3.0, dt=0.005):
    import jax.numpy as jnp

    from navierstokes_tpu import config
    from navierstokes_tpu.fem.bcs import VelocityBCType
    from navierstokes_tpu.mesh import channel_with_cylinder
    from navierstokes_tpu.solvers import ImplicitBDFSolver
    from navierstokes_tpu.timestepping import BDFTimeStepping

    wake = float(os.environ.get("NS_DFG_WAKE", "1"))
    mesh, markers, bm = channel_with_cylinder(resolution, wake=wake)
    h = 4.1
    visc = 1.0 / 100.0

    def inlet(x):
        s = x[:, 1] / h
        return np.stack([6.0 * s * (1.0 - s), np.zeros(len(x))], axis=1)

    data = np.load(resume)
    assert float(data["resolution"]) == resolution
    t0 = float(data["t"])

    ts = BDFTimeStepping(t0, t_end, desired_start_time_step=dt)
    linear = os.environ.get("NS_DFG_MONO_LINSOLVE", "csr")
    form = os.environ.get("NS_DFG_MONO_FORM", "standard")
    solver = ImplicitBDFSolver(mesh, markers, form, ts,
                               tol=float(os.environ.get(
                                   "NS_DFG_MONO_TOL", "1e-8")),
                               linear_solver=linear)
    solver.set_boundary_conditions(
        ((VelocityBCType.function, bm["inlet"], inlet),
         (VelocityBCType.no_slip, bm["cylinder"], None),
         (VelocityBCType.no_slip, bm["upper wall"], None),
         (VelocityBCType.no_slip, bm["lower wall"], None)))
    # NO outlet condition: do-nothing traction-free outflow, the
    # reference configuration (pressure level fixed by the natural BC)
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": visc,
         "pressure_term": 1.0, "coriolis_term": None,
         "euler_term": None, "body_force_term": None})
    # seed the BDF-2 ring from the saturated split-scheme state
    solver.set_initial_conditions({"velocity": (0.0, 0.0)})
    space = solver.space
    dtp = config.default_dtype()
    u = np.asarray(data["u"], np.float64)
    u_old = np.asarray(data["u_old"], np.float64)
    p = np.asarray(data["p"], np.float64)
    x_now = np.concatenate([u, p])
    x_prev = np.concatenate([u_old, p])
    solver._solutions[0] = jnp.asarray(x_now, dtp)
    solver._solutions[1] = jnp.asarray(x_now, dtp)
    solver._solutions[2] = jnp.asarray(x_prev, dtp)
    print(f"monolithic: {space.n_dofs} DoF, resumed t={t0}, "
          f"linear={linear}", flush=True)

    # durable-results rule (round-4 verdict item 9): final states/series
    # live under the committed benchmarks/states/, not gitignored results/
    states_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "states")
    # NS_DFG_MONO_TAG isolates probe runs (quadrature/convective-form
    # sensitivity) from the main arbiter series files
    suffix = f"_mono_res{resolution:g}" + os.environ.get(
        "NS_DFG_MONO_TAG", "")
    os.makedirs(states_dir, exist_ok=True)
    series_path = os.path.join(states_dir,
                               f"dfg_2d2_coefficients{suffix}.txt")
    prev = []
    if "series_t" in data:  # resuming a monolithic state: keep history
        if os.path.exists(series_path):
            prev = np.loadtxt(series_path, ndmin=2)
            prev = prev[prev[:, 0] <= t0 + 1e-9].tolist()
    series = []

    def save_all():
        arr = np.asarray(prev + series)
        np.savetxt(series_path, arr)
        un, pn = space.split(solver._solutions[0])
        uo, _ = space.split(solver._solutions[2])
        np.savez(os.path.join(states_dir, f"dfg_2d2_state{suffix}.npz"),
                 u=np.asarray(un, np.float64).reshape(-1),
                 u_old=np.asarray(uo, np.float64).reshape(-1),
                 p=np.asarray(pn, np.float64), t=series[-1][0],
                 resolution=resolution, series_t=1.0)
        return arr

    tstart = time.time()
    n_steps = int(round((t_end - t0) / dt))
    for step_i in range(n_steps):
        ts.update_coefficients()
        solver.solve()
        F = solver.boundary_reaction_force(bm["cylinder"])
        series.append([ts.next_time, 2.0 * float(F[0]), 2.0 * float(F[1])])
        ts.advance_time()
        solver.advance_time()
        if (step_i + 1) % int(os.environ.get("NS_DFG_MONO_PRINT", "20")) == 0:
            el = time.time() - tstart
            print(f"t={series[-1][0]:8.3f}  c_D={series[-1][1]:7.4f}  "
                  f"c_L={series[-1][2]:8.4f}  [{el / (step_i + 1):.2f} "
                  f"s/step]", flush=True)
            save_all()
    arr = save_all()

    if len(arr) > 400:
        from navierstokes_tpu.utils.signal import periodic_fit

        w = arr[arr[:, 0] > arr[-1, 0] - 10.0]
        out = {"dofs": space.n_dofs, "dt": dt, "t_end": float(arr[-1, 0])}
        if len(w) > 300:
            fd = periodic_fit(w[:, 0], w[:, 1], K=8)
            fl = periodic_fit(w[:, 0], w[:, 2], K=8)
            out.update(cd_max_fit=round(fd["max"], 4),
                       cl_max_fit=round(fl["max"], 4),
                       cl_min_fit=round(fl["min"], 4),
                       st_fit=round(fl["freq"], 4))
        print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    if "--cpu" in sys.argv[1:]:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    main(args[0], float(args[1]) if len(args) > 1 else 210.0,
         float(args[2]) if len(args) > 2 else 3.0,
         float(args[3]) if len(args) > 3 else 0.005)
