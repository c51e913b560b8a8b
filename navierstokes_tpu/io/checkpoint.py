"""Checkpoint / resume of transient solver state.

The reference explicitly lacks this ("add serialization and restart
features", reference README.md ToDo); here the full restartable state --
solution ring, separate IPCS fields when present, and the discrete-time
bookkeeping -- round-trips through a single ``.npz``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def save_checkpoint(path: str, solver, time_stepping) -> None:
    data = {
        "current_time": time_stepping.current_time,
        "previous_time": time_stepping.previous_time,
        "next_time": time_stepping.next_time,
        "step_number": time_stepping.step_number,
    }
    for i, sol in enumerate(solver._solutions):
        data[f"solution_{i}"] = np.asarray(sol)
    if hasattr(solver, "_velocities"):
        for i, v in enumerate(solver._velocities):
            data[f"velocity_{i}"] = np.asarray(v)
        data["pressure"] = np.asarray(solver._pressure)
        data["old_pressure"] = np.asarray(solver._old_pressure)
        data["older_pressure"] = np.asarray(solver._older_pressure)
        data["intermediate_velocity"] = np.asarray(
            solver._intermediate_velocity)
    np.savez(path, **data)


def load_checkpoint(path: str, solver, time_stepping) -> None:
    """Restore state saved by :func:`save_checkpoint` (same discretization)."""
    data = np.load(path)
    n = len(solver._solutions)
    solver._solutions = [jnp.asarray(data[f"solution_{i}"])
                         for i in range(n)]
    if hasattr(solver, "_velocities"):
        solver._velocities = [jnp.asarray(data[f"velocity_{i}"])
                              for i in range(len(solver._velocities))]
        solver._pressure = jnp.asarray(data["pressure"])
        solver._old_pressure = jnp.asarray(data["old_pressure"])
        if "older_pressure" in data:
            solver._older_pressure = jnp.asarray(data["older_pressure"])
        solver._intermediate_velocity = jnp.asarray(
            data["intermediate_velocity"])
    ts = time_stepping
    ts._previous_time = float(data["previous_time"])
    ts._current_time = float(data["current_time"])
    ts._next_time = float(data["next_time"])
    ts._step_number = int(data["step_number"])
