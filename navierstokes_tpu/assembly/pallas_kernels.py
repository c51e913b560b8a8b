"""Pallas TPU kernels for the element-apply hot path.

``element_apply``: y_c = A_c @ u_c batched over cells -- the core of every
precomputed-element-matrix matvec (mass/stiffness/Helmholtz applies in
parallel/sharded.py).  XLA lowers the batched (nc, nn, nn) x (nn, d)
matmuls through generic dot batching; this kernel instead streams
cell blocks through VMEM and unrolls the tiny contraction on the VPU as
fused multiply-adds over the (cells, d) lanes.

Opt-in via ``ShardedCellOperator(..., use_pallas=True)`` or the
``NS_TPU_PALLAS=1`` environment variable; numerically identical to the
XLA einsum path (tests/test_pallas_kernels.py).  Falls back to interpret
mode off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLOCK = 512


def _element_apply_kernel(nn: int, d: int):
    def kernel(a_ref, u_ref, out_ref):
        # a: (BLOCK, nn*nn), u: (BLOCK, nn*d), out: (BLOCK, nn*d)
        a = a_ref[:]
        u = u_ref[:]
        for i in range(nn):
            acc = None
            for j in range(nn):
                coeff = a[:, i * nn + j]            # (BLOCK,)
                contrib = coeff[:, None] * u[:, j * d:(j + 1) * d]
                acc = contrib if acc is None else acc + contrib
            out_ref[:, i * d:(i + 1) * d] = acc

    return kernel


def element_apply(A_c, u_c, interpret=None):
    """Batched y_c[c] = A_c[c] @ u_c[c].

    A_c: (nc, nn, nn); u_c: (nc, nn, d) -> (nc, nn, d).
    The cell count must be padded to a multiple of the block size by the
    caller (ShardedCellOperator pads to the device count already; this
    function pads the remainder internally).
    """
    nc, nn, _ = A_c.shape
    d = u_c.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    block = min(_BLOCK, max(8, nc))
    n_pad = (-nc) % block
    A_flat = A_c.reshape(nc, nn * nn)
    u_flat = u_c.reshape(nc, nn * d)
    if n_pad:
        A_flat = jnp.concatenate(
            [A_flat, jnp.zeros((n_pad, nn * nn), A_flat.dtype)])
        u_flat = jnp.concatenate(
            [u_flat, jnp.zeros((n_pad, nn * d), u_flat.dtype)])
    total = nc + n_pad

    out = pl.pallas_call(
        _element_apply_kernel(nn, d),
        grid=(total // block,),
        in_specs=[
            pl.BlockSpec((block, nn * nn), lambda i: (i, 0)),
            pl.BlockSpec((block, nn * d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, nn * d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((total, nn * d), u_flat.dtype),
        interpret=interpret,
    )(A_flat, u_flat)
    return out[:nc].reshape(nc, nn, d)
