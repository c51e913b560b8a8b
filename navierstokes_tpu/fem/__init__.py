"""Finite-element core: reference elements, quadrature, dofmaps, BCs."""

from navierstokes_tpu.fem.bcs import (  # noqa: F401
    PressureBCType,
    TractionBCType,
    VelocityBCType,
)
