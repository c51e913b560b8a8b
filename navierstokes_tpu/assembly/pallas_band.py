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


def _band_contract(groups, m, band_ref, xb):
    """One plane of the circulant contraction (value in, value out)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 1)
    acc = None
    for r in sorted(groups):
        if r == 0:
            a = xb
        else:
            # circular flat roll by r (< 128): lane roll + row carry.
            # lr[m, l] = xb[m, (l + r) % 128]; the lanes l >= 128 - r
            # wrapped within the row and must come from the NEXT row
            # instead -> select against lr rolled one row up (circularly,
            # which is exactly the mod-N wrap of the circulant).
            # pltpu.roll requires shift >= 0: roll by -s == roll by n - s.
            lr = pltpu.roll(xb, LANES - r, axis=1)
            lr1 = pltpu.roll(lr, m - 1, axis=0)
            a = jnp.where(lane < LANES - r, lr, lr1)
        for k, q in groups[r]:
            w = a if q == 0 else pltpu.roll(a, m - q, axis=0)
            term = band_ref[k] * w
            acc = term if acc is None else acc + term
    return acc


def _make_kernel(offsets, m, batch):
    groups = _group_by_residue(offsets)

    def kernel(x_ref, band_ref, out_ref):
        for b in range(batch):
            out_ref[b] = _band_contract(groups, m, band_ref, x_ref[b])

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


def _make_cg_kernel(offsets, m, batch, iters, meanfree):
    """Whole Jacobi-PCG solve in ONE kernel (VMEM-resident).

    Mirrors solvers/planar_step._pcg exactly (same update order, same
    zero-denominator guards; the nullspace/Dirichlet projection is the
    unified ``maskv`` multiply -- a numerically exact no-op where _pcg
    applies no projection, since constrained-row residuals are
    identically zero).  Fixed iteration count (the production scan path
    runs rtol=None).  Removes the ~60-iteration-per-solve launch
    overhead of the pressure-Poisson CG -- each XLA-level iteration is
    5-8 separate ~2 us kernels, while in-kernel it is ~2-4 us total.
    """
    groups = _group_by_residue(offsets)
    inv_n = 1.0 / float(batch * m * LANES)

    def kernel(b_ref, x0_ref, invd_ref, maskv_ref, band_ref,
               x_out, r_out):
        bb = b_ref[:]
        x0 = x0_ref[:]
        invd = invd_ref[:]
        maskv = maskv_ref[:]

        def band_apply(v):
            return jnp.stack([_band_contract(groups, m, band_ref, v[b])
                              for b in range(batch)], axis=0)

        def matvec(v):
            w = band_apply(maskv * v)
            return maskv * w + (1.0 - maskv) * v

        def project(r):
            r = maskv * r
            if meanfree:
                r = r - jnp.sum(r) * inv_n
            return r

        r0 = project(bb - matvec(x0))
        z0 = invd * r0
        rz0 = jnp.sum(r0 * z0)

        def body(i, st):
            x, r, z, p, rz = st
            Ap = matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = jnp.where(jnp.abs(denom) > 0.0, rz / denom, 0.0)
            x = x + alpha * p
            r = project(r - alpha * Ap)
            z = invd * r
            rz_new = jnp.sum(r * z)
            beta = jnp.where(jnp.abs(rz) > 0.0, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, z, p, rz_new)

        x, r, _, _, _ = jax.lax.fori_loop(
            0, iters, body, (x0, r0, z0, z0, rz0))
        x_out[:] = x
        r_out[:] = r

    return kernel


@functools.lru_cache(maxsize=64)
def _build_cg_call(offsets, m, batch, iters, meanfree, interpret):
    kernel = _make_cg_kernel(offsets, m, batch, iters, meanfree)
    shape = jax.ShapeDtypeStruct((batch, m, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + int(28e6)),
        interpret=bool(interpret),
    )


def cg_eligible(offsets, n, dtype, band_nbytes, batch) -> bool:
    if not eligible(offsets, n, dtype, band_nbytes):
        return False
    # band + 8 live state/input arrays of batch planes
    return band_nbytes + 9 * batch * n * 4 <= _VMEM_BUDGET


def circulant_pcg(band, offsets, b, x0, inv_diag, maskv, iters,
                  meanfree, *, interpret=False):
    """(x, r) after ``iters`` Jacobi-PCG steps, all inside one kernel."""
    n = b.shape[-1]
    m = n // LANES
    lead = b.shape[:-1]
    batch = int(np.prod(lead)) if lead else 1

    def rs(a):
        return jnp.broadcast_to(a, lead + (n,)).reshape(batch, m, LANES)

    call = _build_cg_call(tuple(int(o) for o in offsets), m, batch,
                          int(iters), bool(meanfree), bool(interpret))
    x, r = call(rs(b), rs(x0), rs(inv_diag), rs(maskv),
                band.reshape(len(offsets), m, LANES))
    return x.reshape(lead + (n,)), r.reshape(lead + (n,))


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
