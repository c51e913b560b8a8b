"""Steady DFG 2D-1 cylinder benchmark (Re=20): drag/lift validation.

Literature reference intervals (Schafer & Turek 1996, nondimensionalized
by cylinder diameter and mean inflow velocity): c_D in [5.57, 5.59],
c_L in [0.0104, 0.0110], pressure difference dP in [2.93, 2.94]
(0.1172-0.1176 in the dimensional setup divided by rho U^2 = 0.04).

This pins down the whole unstructured pipeline: the native cylinder-channel
mesh generator, the stationary Picard->Newton solve, and both force
evaluations (nodal reactions, superconvergent; direct traction integral,
first order)."""

import numpy as np

from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import channel_with_cylinder
from navierstokes_tpu.solvers import StationarySolver


def test_dfg_2d1_steady_drag_lift():
    mesh, markers, bm = channel_with_cylinder(resolution=1.0)
    solver = StationarySolver(mesh, markers)
    h = 4.1

    def inlet(x):
        s = x[:, 1] / h
        return np.stack([6.0 * s * (1.0 - s), np.zeros(len(x))], axis=1)

    solver.set_boundary_conditions(
        ((VelocityBCType.function, bm["inlet"], inlet),
         (VelocityBCType.no_slip, bm["cylinder"], None),
         (VelocityBCType.no_slip, bm["upper wall"], None),
         (VelocityBCType.no_slip, bm["lower wall"], None)))
    visc = 1.0 / 20.0
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": visc, "pressure_term": 1.0,
         "coriolis_term": None, "euler_term": None, "body_force_term": None})
    solver.solve()

    # superconvergent reaction forces
    force = solver.boundary_reaction_force(bm["cylinder"])
    c_d = 2.0 * force[0]
    c_l = 2.0 * force[1]
    assert abs(c_d - 5.58) < 0.05, c_d          # lit: 5.57-5.59
    assert abs(c_l - 0.0107) < 0.002, c_l       # lit: 0.0104-0.0110

    # pressure difference front/back of the cylinder, evaluated AT the
    # stagnation points (exact FE interpolation; with the curved mesh both
    # are vertices).  Full convergence into [2.93, 2.94] needs ~50k DoF
    # (docs/VALIDATION.md: 2.9360 at 51k, 2.9329 at 100k); this coarse
    # 10k-DoF config is tested with matching slack.
    u, p = solver.space.split(solver.solution)
    vals = solver.space.eval_pressure(np.asarray(p),
                                      [[1.5, 2.0], [2.5, 2.0]])
    dp = float(vals[0] - vals[1])
    assert abs(dp - 2.935) < 0.06, dp           # lit: 2.93-2.94

    # the direct traction integral is consistent but first-order accurate
    batch = solver.operator.facet_batch_device(
        solver.space.facet_batch(markers.ids_with_value(bm["cylinder"])))
    direct = solver.operator.boundary_traction_force(batch, u, p, visc)
    c_d_direct = 2.0 * float(-direct[0])
    assert abs(c_d_direct - c_d) / c_d < 0.25
