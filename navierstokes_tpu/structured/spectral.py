"""Exact FFT block-diagonal solves + fused projection step (periodic).

A stencil over the class grids is block-circulant on the (nx, ny) cell
lattice, so the 2D DFT block-diagonalizes it exactly: for each Fourier mode
k the P2 operators become dense 4x4 complex blocks (one row/column per node
class), the P1 Laplacian a scalar symbol.  The three linear solves of the
incremental projection scheme (Helmholtz, pressure Poisson, mass
correction -- solvers/fused_step.py) are then *direct* solves:

    FFT -> batched 4x4 complex solve / scalar divide -> inverse FFT

with no Krylov iteration and no iteration-count tuning; accuracy is machine
epsilon of the working dtype (a strictly stronger guarantee than the fixed
CG sweeps of the generic path, VERDICT weak #4).  Per step the only
transforms are one forward FFT of the convection term and one inverse FFT
of the new velocity (the state carries both representations).

Reference semantics: one incremental-pressure-correction step with
extrapolated convection (scripts/test_ipcs.py:102-171); equivalence with
the unstructured fused step is asserted in tests/test_structured.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from navierstokes_tpu.structured.grid import N_UCLASS, PeriodicStructuredTH
from navierstokes_tpu.structured.ops import StructuredConvection


def _symbol(taps, nx, ny, shape):
    """Fourier symbol of a tap set: S[k] = sum_s w(s) e^{+2 pi i k.s / N}.

    ``shape``: trailing block shape, e.g. (4, 4) for P2->P2 taps with
    scalar weights, (4, d) for the gradient/divergence couplings (the class
    axis is whichever side is P2 -- output for the gradient, input for the
    divergence), () for the P1 Laplacian.
    """
    T = np.zeros((nx, ny) + shape, dtype=np.complex128)
    for (co, ci), entries in taps.items():
        for s, w in entries:
            i, j = s[0] % nx, s[1] % ny
            if shape == (N_UCLASS, N_UCLASS):
                T[i, j, co, ci] += w
            elif shape == ():
                T[i, j] += w
            else:                       # (4, d) coupling: the P2-side class
                T[i, j, max(co, ci)] += np.asarray(w)
    return np.conj(np.fft.fft2(T, axes=(0, 1)))


class SpectralOperators:
    """Precomputed Fourier symbols of the periodic Taylor-Hood operators."""

    def __init__(self, sgrid: PeriodicStructuredTH, dtype):
        nx, ny, d = sgrid.nx, sgrid.ny, sgrid.space.dim
        self.sgrid = sgrid
        self.nx, self.ny, self.d = nx, ny, d
        self.rdtype = dtype
        self.cdtype = jnp.complex64 if dtype == jnp.float32 \
            else jnp.complex128

        blk = (N_UCLASS, N_UCLASS)
        self.Mhat = jnp.asarray(
            _symbol(sgrid.taps_uu(sgrid.M_tau), nx, ny, blk), self.cdtype)
        self.Khat = jnp.asarray(
            _symbol(sgrid.taps_uu(sgrid.K_tau), nx, ny, blk), self.cdtype)
        self.Ghat = jnp.asarray(
            _symbol(sgrid.taps_up(sgrid.G_tau), nx, ny, (N_UCLASS, d)),
            self.cdtype)
        self.Dhat = jnp.asarray(
            _symbol(sgrid.taps_pu(sgrid.G_tau), nx, ny, (N_UCLASS, d)),
            self.cdtype)
        Lhat = _symbol(sgrid.taps_pp(sgrid.L_tau), nx, ny, ())
        # pseudo-inverse: the k=0 (constant) mode is the mean-pressure null
        # space -- project it out (the mean-free convention of
        # solvers/fused_step.py project_p)
        Lhat[0, 0] = 1.0
        Linv = 1.0 / Lhat
        Linv[0, 0] = 0.0
        self.Linv = jnp.asarray(Linv, self.cdtype)

    # -- transforms ----------------------------------------------------------
    def fwd_u(self, U):
        """Physical (4, nx, ny, d) -> spectral (nx, ny, 4, d)."""
        return jnp.transpose(jnp.fft.fft2(U.astype(self.cdtype),
                                          axes=(1, 2)), (1, 2, 0, 3))

    def inv_u(self, Uh):
        return jnp.real(jnp.fft.ifft2(jnp.transpose(Uh, (2, 0, 1, 3)),
                                      axes=(1, 2))).astype(self.rdtype)

    def fwd_p(self, P):
        return jnp.fft.fft2(P.astype(self.cdtype))

    def inv_p(self, Ph):
        return jnp.real(jnp.fft.ifft2(Ph)).astype(self.rdtype)

    # -- spectral operator applications --------------------------------------
    def mass(self, Uh):
        return jnp.einsum("xyab,xybd->xyad", self.Mhat, Uh)

    def grad(self, Ph):
        return jnp.einsum("xyad,xy->xyad", self.Ghat, Ph)

    def div(self, Uh):
        return jnp.einsum("xyad,xyad->xy", self.Dhat, Uh)

    def helmholtz_solve(self, accel0, visc, Bh):
        """(accel0 M + visc K) Uh = Bh, exactly, all modes at once."""
        H = accel0.astype(self.cdtype) * self.Mhat + visc * self.Khat
        return jnp.linalg.solve(H, Bh)

    def mass_solve(self, Bh):
        return jnp.linalg.solve(self.Mhat, Bh)

    def poisson_solve(self, Rh):
        return self.Linv * Rh


def build_spectral_projection_step(sgrid: PeriodicStructuredTH, *, visc,
                                   dt, dtype=None):
    """Fused projection step on class grids with exact spectral solves.

    Returns ``(step, init_state, read_state)``:

      * ``state = step(state, alpha, eta)`` advances one SBDF step
        (``alpha=(a0,a1,a2)`` BDF weights, ``eta=(e0,e1)`` convection
        extrapolation -- traced, so variable steps never recompile);
      * ``init_state(u_flat, u_old_flat, p_flat) -> state``;
      * ``read_state(state) -> (u_flat, p_flat)`` on the host layout.
    """
    from navierstokes_tpu import config

    rdtype = dtype or config.default_dtype()
    ops = SpectralOperators(sgrid, jnp.dtype(rdtype))
    conv = StructuredConvection(sgrid, rdtype)
    k = dt

    @jax.jit
    def step(state, alpha, eta):
        U, U_old, Uh, Uh_old, Ph = state
        a0, a1, a2 = alpha

        # (1) Helmholtz: (a0/k M + nu K) u* = -(a1/k)M u - (a2/k)M u_old
        #                                     - C(extrapolated u) - G p
        U_ext = eta[0] * U + eta[1] * U_old
        Ch = ops.fwd_u(conv(U_ext))
        Bh = (-(a1 / k) * ops.mass(Uh) - (a2 / k) * ops.mass(Uh_old)
              - Ch - ops.grad(Ph))
        Ustar_h = ops.helmholtz_solve(a0 / k, visc, Bh)

        # (2) incremental pressure Poisson (exact, mean-free)
        Phi_h = ops.poisson_solve((a0 / k) * ops.div(Ustar_h))

        # (3) velocity correction + pressure update
        Uh_new = Ustar_h - (k / a0) * ops.mass_solve(ops.grad(Phi_h))
        Ph_new = (Ph + Phi_h).at[0, 0].set(0.0)

        U_new = ops.inv_u(Uh_new)
        return (U_new, U, Uh_new, Uh, Ph_new)

    def init_state(u_flat, u_old_flat, p_flat):
        U = jnp.asarray(sgrid.u_to_grids(np.asarray(u_flat)), rdtype)
        U_old = jnp.asarray(sgrid.u_to_grids(np.asarray(u_old_flat)),
                            rdtype)
        P = jnp.asarray(sgrid.p_to_grid(np.asarray(p_flat)), rdtype)
        Ph = ops.fwd_p(P - jnp.mean(P))
        return (U, U_old, ops.fwd_u(U), ops.fwd_u(U_old), Ph)

    def read_state(state):
        U, _, _, _, Ph = state
        u_flat = sgrid.grids_to_u(np.asarray(U))
        p_flat = sgrid.grid_to_p(np.asarray(ops.inv_p(Ph)))
        return u_flat, p_flat

    return step, init_state, read_state
