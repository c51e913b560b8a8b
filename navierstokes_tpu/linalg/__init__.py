"""Device linear algebra: Krylov solvers, direct fallbacks, Newton driver."""

from navierstokes_tpu.linalg.krylov import cg, gmres, bicgstab  # noqa: F401
from navierstokes_tpu.linalg.direct import dense_solve  # noqa: F401
from navierstokes_tpu.linalg.newton import (  # noqa: F401
    NewtonResult,
    newton_solve,
)
