"""Utilities: solver monitoring/metrics."""

from navierstokes_tpu.utils.monitor import SolverMonitor  # noqa: F401
