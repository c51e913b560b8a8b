"""Stencil (shift-based) operator application on class grids.

Each operator is a list of taps ``(c_out, c_in, (si, sj), weight)``; applying
it is a sum of ``jnp.roll`` shifts and fused multiply-adds over (nx, ny[, d])
tensors -- pure VPU-elementwise work that XLA fuses into a single pass, with
none of the per-row gathers that bound the unstructured element loop
(cf. parallel/sharded.py docstring).  Periodic wrap is exactly ``jnp.roll``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# TPU matmuls default to bfloat16 inputs, which loses ~4e-3 relative per
# contraction -- far too coarse for the DFT and symbol applies.  Default to
# full f32 ("highest"); overridable for experiments via env.
import os as _os

_PREC = getattr(jax.lax.Precision,
                _os.environ.get("NS_TPU_MATMUL_PRECISION", "HIGHEST"))


def _einsum(*args, **kw):
    kw.setdefault("precision", _PREC)
    return jnp.einsum(*args, **kw)


from navierstokes_tpu.structured.grid import N_UCLASS


def _roll(A, s):
    """A[g] -> A[g + s] with periodic wrap (negative jnp.roll shift)."""
    si, sj = int(s[0]), int(s[1])
    if si == 0 and sj == 0:
        return A
    return jnp.roll(A, shift=(-si, -sj), axis=(0, 1))


def apply_uu(taps, U, dtype=None):
    """Scalar P2->P2 stencil applied per velocity component.

    ``U``: (4, nx, ny, d) -> (4, nx, ny, d).
    """
    out = [None] * N_UCLASS
    for (co, ci), entries in taps.items():
        acc = 0.0
        for s, w in entries:
            acc = acc + float(w) * _roll(U[ci], s)
        out[co] = acc if out[co] is None else out[co] + acc
    zero = jnp.zeros_like(U[0])
    return jnp.stack([o if o is not None else zero for o in out])


def apply_up(taps, P):
    """Vector-weighted P1->P2 stencil (pressure gradient).

    taps weights are (d,); ``P``: (nx, ny) -> (4, nx, ny, d).
    """
    out = [None] * N_UCLASS
    for (co, _ci), entries in taps.items():
        acc = 0.0
        for s, w in entries:
            acc = acc + jnp.asarray(np.asarray(w), P.dtype) \
                * _roll(P, s)[..., None]
        out[co] = acc if out[co] is None else out[co] + acc
    d = len(next(iter(taps.values()))[0][1])
    zero = jnp.zeros(P.shape + (d,), P.dtype)
    return jnp.stack([o if o is not None else zero for o in out])


def apply_pu(taps, U):
    """Vector-contracting P2->P1 stencil (divergence): (4, nx, ny, d) ->
    (nx, ny)."""
    acc = 0.0
    for (_co, ci), entries in taps.items():
        for s, w in entries:
            acc = acc + _einsum(
                "xyd,d->xy", _roll(U[ci], s),
                jnp.asarray(np.asarray(w), U.dtype))
    return acc


def apply_pp(taps, P):
    """Scalar P1->P1 stencil: (nx, ny) -> (nx, ny)."""
    acc = 0.0
    for s, w in taps[(0, 0)]:
        acc = acc + float(w) * _roll(P, s)
    return acc


# ---------------------------------------------------------------------------
# nonlinear convection on class grids
# ---------------------------------------------------------------------------

class StructuredConvection:
    """b_i = int((u . grad)u . N_i) assembled entirely with shifts.

    The element quadrature is identical to the unstructured path
    (parallel/sharded.py make_convection_rhs, itself the scheme of the
    reference prototype scripts/test_ipcs.py:102-133); the cell gather and
    the transpose-table scatter are replaced by 12 rolls in and 12 rolls
    out of the class grids.
    """

    def __init__(self, sgrid, dtype):
        space = sgrid.space
        self.sgrid = sgrid
        self.N2 = jnp.asarray(space.N2, dtype)            # (nq, 6)
        g2 = np.einsum("qia,tae->tqie", space.G2, sgrid.Jinv_tau)
        self.g2 = jnp.asarray(g2, dtype)                  # (2, nq, 6, d)
        self.W = jnp.asarray(sgrid.W_tau, dtype)          # (2, nq)

    def gather_local(self, U):
        """(4, nx, ny, d) -> (2, 6, nx, ny, d) per-triangle local values."""
        sg = self.sgrid
        rows = []
        for t in range(2):
            loc = [
                _roll(U[sg.u_class[t, l]], sg.u_shift[t, l])
                for l in range(6)
            ]
            rows.append(jnp.stack(loc))
        return jnp.stack(rows)

    def scatter_local(self, R):
        """(2, 6, nx, ny, d) local contributions -> (4, nx, ny, d)."""
        sg = self.sgrid
        out = [0.0] * N_UCLASS
        for t in range(2):
            for l in range(6):
                c = int(sg.u_class[t, l])
                s = -sg.u_shift[t, l]
                out[c] = out[c] + _roll(R[t, l], s)
        return jnp.stack(out)

    def __call__(self, U):
        u_loc = self.gather_local(U)                      # (2,6,x,y,d)
        u_q = _einsum("qi,tixyd->tqxyd", self.N2, u_loc)
        grad_u = _einsum("tixyd,tqie->tqxyde", u_loc, self.g2)
        conv = _einsum("tqxyde,tqxye->tqxyd", grad_u, u_q)
        r = _einsum("tq,tqxyd,qi->tixyd", self.W, conv, self.N2)
        return self.scatter_local(r)
