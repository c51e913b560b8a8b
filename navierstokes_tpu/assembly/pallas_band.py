"""Pallas TPU kernel for the CirculantBand matvec.

The XLA ``stack`` lowering of ``CirculantBand.apply`` materializes a
(K, ..., N) window tensor in HBM (~24 MB at 128^2 against a 6 MB band),
so each apply runs ~6x above the band-traffic roofline and the generic
projection step is CG-launch/materialization bound (docs/ROUND4.md,
"Next-round perf lever").  This kernel performs the whole contraction

    y[i] = sum_k band[k, i] * x[(i + off_k) mod N]

in ONE kernel with the operand resident in VMEM:

- x is viewed as (M, 128) lanes-major; the doubled copy P = [x; x]
  makes every wrapped window a contiguous slice.
- each circulant offset is decomposed o = 128 q + r.  On the
  translation-class grids the banded engine produces (P2/P1 nodes of a
  uniform torus), the lane residue r takes only a handful of values
  ({0, 1, 2, 126, 127} for the velocity stencils) because the grid row
  width is a multiple of 128.
- per distinct residue r, ONE flat roll of P by r is built in VMEM
  (lane roll + sublane shift + lane-index select); each diagonal k then
  needs only a *static* sublane slice of that copy and an fma with its
  band row.

HBM traffic is band + x + y -- the roofline the round-4 decomposition
measured at 8.6 us for the 65k-row velocity operators (vs ~52 us for
the stack lowering).  No reference counterpart: this replaces the PETSc
SpMV inside the per-step Krylov solves (ns_ipcs_solver.py:149-196).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# conservative VMEM budget for band + operand + temporaries (bytes)
_VMEM_BUDGET = int(100e6)


def eligible(offsets, n, dtype, band_nbytes) -> bool:
    """Static shape/dtype gate for the single-program kernel."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n % LANES != 0:
        return False
    m = n // LANES
    if m < 8:                       # below the f32 (8, 128) tile
        return False
    # band + doubled operand + rolled copy + accumulator, all f32
    if band_nbytes + 6 * n * 4 > _VMEM_BUDGET:
        return False
    return all(0 <= o < n for o in offsets)


def _group_by_residue(offsets):
    groups = {}
    for k, o in enumerate(offsets):
        groups.setdefault(int(o) % LANES, []).append((k, int(o) // LANES))
    return groups


def _make_kernel(offsets, m, batch):
    groups = _group_by_residue(offsets)

    def kernel(x_ref, band_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 1)
        for b in range(batch):
            xb = x_ref[b]
            acc = None
            for r in sorted(groups):
                if r == 0:
                    a = xb
                else:
                    # circular flat roll by r (< 128): lane roll + row
                    # carry.  lr[m, l] = xb[m, (l + r) % 128]; the lanes
                    # l >= 128 - r wrapped within the row and must come
                    # from the NEXT row instead -> select against lr
                    # rolled one row up (circularly, which is exactly
                    # the mod-N wrap of the circulant).  pltpu.roll
                    # requires shift >= 0: roll by -s == roll by n - s.
                    lr = pltpu.roll(xb, LANES - r, axis=1)
                    lr1 = pltpu.roll(lr, m - 1, axis=0)
                    a = jnp.where(lane < LANES - r, lr, lr1)
                for k, q in groups[r]:
                    w = a if q == 0 else pltpu.roll(a, m - q, axis=0)
                    term = band_ref[k] * w
                    acc = term if acc is None else acc + term
            out_ref[b] = acc

    return kernel


@functools.lru_cache(maxsize=64)
def _build_call(offsets, m, batch, interpret):
    kernel = _make_kernel(offsets, m, batch)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, m, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + int(28e6)),
        interpret=bool(interpret),
    )


def circulant_apply(band, offsets, x, *, interpret=False):
    """y[..., i] = sum_k band[k, i] * x[..., (i + off_k) mod N]."""
    n = x.shape[-1]
    m = n // LANES
    lead = x.shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    xb = x.reshape(batch, m, LANES)
    bandr = band.reshape(len(offsets), m, LANES)
    call = _build_call(tuple(int(o) for o in offsets), m, batch,
                       bool(interpret))
    return call(xb, bandr).reshape(lead + (n,))
