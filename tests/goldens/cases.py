"""Golden-field case definitions (shared by generate.py and the test).

Each case returns the final mixed solution vector as host float64 plus a
short description.  All cases run the CPU f64 backend (tests/conftest.py)
so the frozen fields realize BASELINE.md's "match FEniCS to 1e-8"
contract as closely as this environment allows: FEniCS itself cannot be
installed here, so the framework's own converged f64 solutions are
frozen and every CI run must reproduce them to L2 <= 1e-8 (guarding
against silent numeric drift).  Reference parity:
/root/reference/tests/test_stationary_solvers.py:259-261.
"""

import numpy as np

from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
from navierstokes_tpu.fem.spaces import axis_periodic
from navierstokes_tpu.mesh import (HyperCubeBoundaryMarkers, hyper_cube,
                                   hyper_rectangle)
from navierstokes_tpu.solvers import StationarySolver
from navierstokes_tpu.timestepping import BDFTimeStepping

M = HyperCubeBoundaryMarkers
GAMMA = 2.0 * np.pi


def _tg_velocity(x, t=0.0, Re=100.0):
    decay = np.exp(-2.0 * GAMMA ** 2 * t / Re)
    return decay * np.stack([
        np.cos(GAMMA * x[:, 0]) * np.sin(GAMMA * x[:, 1]),
        -np.sin(GAMMA * x[:, 0]) * np.cos(GAMMA * x[:, 1])], axis=1)


def _tg_pressure(x, t=0.0, Re=100.0):
    decay = np.exp(-4.0 * GAMMA ** 2 * t / Re)
    return -0.25 * decay * (np.cos(2 * GAMMA * x[:, 0])
                            + np.cos(2 * GAMMA * x[:, 1]))


def cavity10():
    """Lid-driven cavity, Re=10, 10^2 -- the reference's canonical golden
    (tests/test_stationary_solvers.py:259-261)."""
    mesh, markers = hyper_cube(2, 10)
    solver = StationarySolver(mesh, markers, tol=1e-10)
    solver.set_boundary_conditions(
        ((VelocityBCType.no_slip, M.left.value, None),
         (VelocityBCType.no_slip, M.right.value, None),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.constant, M.top.value, (1.0, 0.0))))
    solver.set_equation_coefficients(_coeffs(Re=10.0))
    solver.solve()
    return np.asarray(solver.solution, np.float64), "cavity Re=10 10^2"


def channel8():
    """Inlet-driven channel, Re=1, parabolic inflow (BC matrix row)."""
    mesh, markers = hyper_rectangle((0.0, 0.0), (10.0, 1.0), (40, 8))

    def inlet(x):
        return np.stack([6.0 * x[:, 1] * (1.0 - x[:, 1]),
                         np.zeros(len(x))], axis=1)

    solver = StationarySolver(mesh, markers, tol=1e-10)
    solver.set_boundary_conditions(
        ((VelocityBCType.function, M.left.value, inlet),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.no_slip, M.top.value, None),
         (PressureBCType.constant, M.right.value, 0.0)))
    solver.set_equation_coefficients(_coeffs(Re=1.0))
    solver.solve()
    return np.asarray(solver.solution, np.float64), "channel Re=1 40x8"


def _coeffs(Re):
    return {"convective_term": 1.0, "viscous_term": 1.0 / Re,
            "pressure_term": 1.0, "coriolis_term": None,
            "euler_term": None, "body_force_term": None}


def _transient(solver_cls, n_steps=2, dt=0.1, n=8, **kw):
    mesh, markers = hyper_cube(2, n)
    stepping = BDFTimeStepping(0.0, 1.0, desired_start_time_step=dt)
    solver = solver_cls(mesh, markers, "standard", stepping, tol=1e-12,
                        **kw)
    solver.set_periodic_boundary_conditions(
        [axis_periodic(0), axis_periodic(1)],
        (M.left.value, M.right.value, M.top.value, M.bottom.value))
    solver.set_boundary_conditions(
        ((PressureBCType.mean_value, None, 0.0),))
    solver.set_equation_coefficients(_coeffs(Re=100.0))
    solver.set_initial_conditions({"velocity": _tg_velocity,
                                   "pressure": _tg_pressure})
    for _ in range(n_steps):
        stepping.update_coefficients()
        solver.solve()
        stepping.advance_time()
        solver.advance_time()
    return np.asarray(solver.solution, np.float64)


def tg_bdf_2steps():
    """Two monolithic BDF steps of the doubly periodic Taylor-Green."""
    from navierstokes_tpu.solvers import ImplicitBDFSolver

    return (_transient(ImplicitBDFSolver),
            "Taylor-Green 8^2 BDF x2 (dt=0.1)")


def tg_ipcs_2steps():
    """Two IPCS fractional steps of the same Taylor-Green."""
    from navierstokes_tpu.solvers import IPCSSolver

    return (_transient(IPCSSolver),
            "Taylor-Green 8^2 IPCS x2 (dt=0.1)")


CASES = {
    "cavity10": cavity10,
    "channel8": channel8,
    "tg_bdf_2steps": tg_bdf_2steps,
    "tg_ipcs_2steps": tg_ipcs_2steps,
}
