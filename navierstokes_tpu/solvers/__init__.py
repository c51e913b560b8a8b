"""Navier-Stokes solvers: stationary Picard->Newton, monolithic BDF, IPCS."""

from navierstokes_tpu.solvers.base import SolverBase  # noqa: F401
from navierstokes_tpu.solvers.stationary import (  # noqa: F401
    StationarySolver,
    StationarySolverBase,
)
from navierstokes_tpu.solvers.transient import (  # noqa: F401
    InstationarySolverBase,
)
from navierstokes_tpu.solvers.bdf import ImplicitBDFSolver  # noqa: F401
from navierstokes_tpu.solvers.ipcs import IPCSSolver  # noqa: F401
from navierstokes_tpu.solvers.projection import ProjectionSolver  # noqa: F401,E402
from navierstokes_tpu.solvers.theta import ThetaSolver  # noqa: F401,E402
from navierstokes_tpu.solvers.imex import IMEXSolver  # noqa: F401,E402
