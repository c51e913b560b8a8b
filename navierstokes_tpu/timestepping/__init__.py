"""Time-axis bookkeeping and time-integration coefficient generators.

Pure-Python (host side): these produce scalar coefficients that are fed into
jitted solver steps as traced arguments, so changing dt / scheme coefficients
never retriggers XLA compilation.
"""

from navierstokes_tpu.timestepping.discrete_time import (  # noqa: F401
    DiscreteTime,
    calculate_next_time,
)
from navierstokes_tpu.timestepping.bdf import BDFTimeStepping  # noqa: F401
from navierstokes_tpu.timestepping.theta import (  # noqa: F401
    GeneralThetaTimeStepping,
    ThetaTimeSteppingType,
)
from navierstokes_tpu.timestepping.imex import (  # noqa: F401
    IMEXTimeStepping,
    IMEXType,
)
