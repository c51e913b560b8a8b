"""Global configuration: dtypes and device policy.

The reference framework runs FEniCS/PETSc in float64 end-to-end.  On TPU,
float64 is software-emulated and slow, so the policy here is:

* **Validation / CI** (CPU backend): enable x64, run everything in float64 so
  solutions match the reference's accuracy contract (nonlinear residual
  <= 1e-10, see /root/reference/source/ns_solver_base.py:986-988).
* **Production / benchmarking** (TPU backend): float32 storage with float32
  Krylov + iterative refinement where needed; tolerances scale accordingly.

``default_dtype()`` picks the widest float the active JAX config supports.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def default_dtype():
    """Device storage dtype.

    float64 wherever x64 is enabled and the backend has a usable f64 path
    (CPU, GPU); float32 on TPU-class backends even with x64 enabled,
    which is the **mixed-precision mode**: the host accumulates float64
    (assembly/host_reference.py) while every device array stays float32
    (TPU has no fast f64 path).  The override is gated on the backend
    actually being TPU-like -- a GPU backend with x64 requested keeps
    float64 (advisor finding, round 2).
    """
    if x64_enabled() and not _f32_only_backend():
        return jnp.float64
    return jnp.float32


def default_int_dtype():
    return jnp.int32


def np_dtype():
    return np.float64 if x64_enabled() else np.float32


def default_tol() -> float:
    """Default nonlinear residual tolerance matched to the active precision.

    The reference asserts ||F||_2 <= 1e-10 (float64).  In float32 that is
    unreachable; 5e-5 tracks the same "converged to roundoff" contract.
    """
    return 1.0e-10 if x64_enabled() else 5.0e-5


def on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _f32_only_backend() -> bool:
    """True for backends without a hardware f64 path (TPU and the axon
    TPU tunnel); False for CPU and CUDA/ROCm GPUs."""
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return backend in ("tpu", "axon")


def enable_x64() -> None:
    """Opt into float64 (call before any tracing)."""
    jax.config.update("jax_enable_x64", True)


_matmul_precision_set = False


def ensure_accurate_matmuls() -> None:
    """Force true-f32 matmul accumulation on accelerators.

    TPU f32 matmuls default to bf16 multiplication passes (~1e-3 relative
    error per contraction), which floors every Krylov solve on the
    assembly sweeps at ~1e-3 relative residual.  Called by the operator
    constructors; opt out with NS_TPU_FAST_MATMUL=1 (bench-only paths set
    their own per-einsum precision).
    """
    global _matmul_precision_set
    if _matmul_precision_set or not on_tpu():
        return
    if os.environ.get("NS_TPU_FAST_MATMUL", "") == "1":
        _matmul_precision_set = True
        return
    jax.config.update("jax_default_matmul_precision", "highest")
    _matmul_precision_set = True


if os.environ.get("NS_TPU_X64", "").lower() in ("1", "true", "yes"):
    enable_x64()
