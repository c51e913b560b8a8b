"""Application-facing problem orchestration (hooks API, coefficients, IO)."""

from navierstokes_tpu.problems.coefficients import (  # noqa: F401
    EquationCoefficientHandler,
)
from navierstokes_tpu.problems.rotation import (  # noqa: F401
    AngularVelocityVector,
    FunctionTime,
)
from navierstokes_tpu.problems.base import (  # noqa: F401,E402
    InstationaryProblem,
    ProblemBase,
    StationaryProblem,
)
