"""Exact DFT block-diagonal solves + fused projection step (periodic).

A stencil over the class grids is block-circulant on the (nx, ny) cell
lattice, so the 2D DFT block-diagonalizes it exactly: for each Fourier mode
k the P2 operators become dense 4x4 complex blocks (one row/column per node
class), the P1 Laplacian a scalar symbol.  The three linear solves of the
incremental projection scheme (Helmholtz, pressure Poisson, mass
correction -- solvers/fused_step.py) are then *direct* solves with
machine-precision accuracy -- a strictly stronger guarantee than the fixed
CG sweeps of the generic path.

TPU-native design: the device code uses **no complex dtype at all** (the
TPU backend lacks complex support).  Spectral fields are split re/im real
pairs; the DFT is two cos/sin *matrix multiplications* per axis -- MXU
work, not butterfly gathers; and the traced-coefficient Helmholtz solve
(a0/k M + nu K) x = b is reduced at setup (host, complex128) to a
generalized eigenbasis per mode:

    (a M + nu K)^{-1} = P diag(1 / (a + nu lam)) P^H,
    P = L^{-H} Q,  M = L L^H,  L^{-1} K L^{-H} = Q diag(lam) Q^H

so the per-step device work is fixed precomputed 4x4 matmuls plus one
elementwise divide by the traced scalar ``a`` -- variable time steps never
recompile and never re-factorize.

Reference semantics: one incremental-pressure-correction step with
extrapolated convection (scripts/test_ipcs.py:102-171); equivalence with
the unstructured fused step is asserted in tests/test_structured.py.
"""

from __future__ import annotations

from typing import NamedTuple

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


class SplitC(NamedTuple):
    """A complex tensor as a (re, im) pair of real device arrays."""

    re: jnp.ndarray
    im: jnp.ndarray


def _split(z, dtype):
    return (jnp.asarray(np.real(z), dtype), jnp.asarray(np.imag(z), dtype))


class MatmulDFT:
    """2D DFT over the two leading grid axes as cos/sin matmuls (MXU)."""

    def __init__(self, nx, ny, dtype):
        def mats(n):
            k = np.arange(n)
            ang = 2.0 * np.pi * np.outer(k, k) / n
            return (jnp.asarray(np.cos(ang), dtype),
                    jnp.asarray(np.sin(ang), dtype))

        self.Cx, self.Sx = mats(nx)
        self.Cy, self.Sy = mats(ny)
        self.nx, self.ny = nx, ny

    def fwd(self, X):
        """Real (..., nx, ny, ...) with grid axes 1,2 of a (a, nx, ny, d)
        tensor -> SplitC, numpy fft convention (e^{-2 pi i k g / N})."""
        # axis x: F = C - iS applied to real input
        ar = _einsum("kx,axyd->akyd", self.Cx, X)
        ai = -_einsum("kx,axyd->akyd", self.Sx, X)
        # axis y
        br = _einsum("ly,akyd->akld", self.Cy, ar) \
            + _einsum("ly,akyd->akld", self.Sy, ai)
        bi = _einsum("ly,akyd->akld", self.Cy, ai) \
            - _einsum("ly,akyd->akld", self.Sy, ar)
        return SplitC(br, bi)

    def inv_real(self, Z: SplitC):
        """Real part of the inverse 2D DFT of a (a, nx, ny, d) SplitC."""
        s = 1.0 / (self.nx * self.ny)
        # axis y: (C + iS) / ny
        ar = _einsum("ly,akyd->akld", self.Cy, Z.re) \
            - _einsum("ly,akyd->akld", self.Sy, Z.im)
        ai = _einsum("ly,akyd->akld", self.Cy, Z.im) \
            + _einsum("ly,akyd->akld", self.Sy, Z.re)
        # axis x, real part only
        out = _einsum("kx,axyd->akyd", self.Cx, ar) \
            - _einsum("kx,axyd->akyd", self.Sx, ai)
        return s * out


def _cmatmul(S, V: SplitC, sub):
    """Split-complex einsum: S (split symbol) times V along ``sub``."""
    Sr, Si = S
    re = _einsum(sub, Sr, V.re) - _einsum(sub, Si, V.im)
    im = _einsum(sub, Sr, V.im) + _einsum(sub, Si, V.re)
    return SplitC(re, im)


class SpectralOperators:
    """Precomputed Fourier symbols + eigenbases, all-real device arrays.

    Spectral velocity layout: SplitC of (nx, ny, 4, d); pressure
    SplitC of (nx, ny).
    """

    def __init__(self, sgrid: PeriodicStructuredTH, dtype):
        nx, ny, d = sgrid.nx, sgrid.ny, sgrid.space.dim
        self.sgrid = sgrid
        self.nx, self.ny, self.d = nx, ny, d
        self.rdtype = jnp.dtype(dtype)
        self.dft = MatmulDFT(nx, ny, self.rdtype)

        blk = (N_UCLASS, N_UCLASS)
        Mh = _symbol(sgrid.taps_uu(sgrid.M_tau), nx, ny, blk)
        Kh = _symbol(sgrid.taps_uu(sgrid.K_tau), nx, ny, blk)
        # enforce Hermitian symmetry (symmetric real-space operators)
        Mh = 0.5 * (Mh + np.conj(np.swapaxes(Mh, -1, -2)))
        Kh = 0.5 * (Kh + np.conj(np.swapaxes(Kh, -1, -2)))
        self.Mhat = _split(Mh, self.rdtype)
        self.Khat = _split(Kh, self.rdtype)
        self.Ghat = _split(
            _symbol(sgrid.taps_up(sgrid.G_tau), nx, ny, (N_UCLASS, d)),
            self.rdtype)
        self.Dhat = _split(
            _symbol(sgrid.taps_pu(sgrid.G_tau), nx, ny, (N_UCLASS, d)),
            self.rdtype)

        # P1 Laplacian: symmetric stencil -> real symbol; pseudo-inverse
        # (the k=0 constant mode is the mean-pressure null space)
        Lh = _symbol(sgrid.taps_pp(sgrid.L_tau), nx, ny, ())
        assert np.abs(Lh.imag).max() < 1e-9 * np.abs(Lh.real).max()
        Lr = Lh.real.copy()
        Lr[0, 0] = 1.0
        Linv = 1.0 / Lr
        Linv[0, 0] = 0.0
        self.Linv = jnp.asarray(Linv, self.rdtype)

        # generalized eigenbasis of (M, K) per mode (host, complex128):
        # M = L L^H; B = L^-1 K L^-H = Q lam Q^H; P = L^-H Q
        Lc = np.linalg.cholesky(Mh)
        Lc_inv = np.linalg.inv(Lc)
        B = Lc_inv @ Kh @ np.conj(np.swapaxes(Lc_inv, -1, -2))
        B = 0.5 * (B + np.conj(np.swapaxes(B, -1, -2)))
        lam, Q = np.linalg.eigh(B)
        P = np.conj(np.swapaxes(Lc_inv, -1, -2)) @ Q
        self.P = _split(P, self.rdtype)                 # (nx, ny, 4, 4)
        self.PH = _split(np.conj(np.swapaxes(P, -1, -2)), self.rdtype)
        self.lam = jnp.asarray(np.maximum(lam, 0.0), self.rdtype)

    # -- transforms ----------------------------------------------------------
    def fwd_u(self, U):
        """Physical (4, nx, ny, d) -> spectral SplitC (nx, ny, 4, d)."""
        Z = self.dft.fwd(U)
        t = lambda a: jnp.transpose(a, (1, 2, 0, 3))
        return SplitC(t(Z.re), t(Z.im))

    def inv_u(self, Uh: SplitC):
        t = lambda a: jnp.transpose(a, (2, 0, 1, 3))
        return self.dft.inv_real(SplitC(t(Uh.re), t(Uh.im)))

    def fwd_p(self, P):
        Z = self.dft.fwd(P[None, :, :, None])
        return SplitC(Z.re[0, :, :, 0], Z.im[0, :, :, 0])

    def inv_p(self, Ph: SplitC):
        Z = SplitC(Ph.re[None, :, :, None], Ph.im[None, :, :, None])
        return self.dft.inv_real(Z)[0, :, :, 0]

    # -- spectral operator applications --------------------------------------
    def mass(self, Uh: SplitC):
        return _cmatmul(self.Mhat, Uh, "xyab,xybd->xyad")

    def stiffness(self, Uh: SplitC):
        return _cmatmul(self.Khat, Uh, "xyab,xybd->xyad")

    def grad(self, Ph: SplitC):
        Gr, Gi = self.Ghat
        re = _einsum("xyad,xy->xyad", Gr, Ph.re) \
            - _einsum("xyad,xy->xyad", Gi, Ph.im)
        im = _einsum("xyad,xy->xyad", Gr, Ph.im) \
            + _einsum("xyad,xy->xyad", Gi, Ph.re)
        return SplitC(re, im)

    def div(self, Uh: SplitC):
        Dr, Di = self.Dhat
        re = _einsum("xyad,xyad->xy", Dr, Uh.re) \
            - _einsum("xyad,xyad->xy", Di, Uh.im)
        im = _einsum("xyad,xyad->xy", Dr, Uh.im) \
            + _einsum("xyad,xyad->xy", Di, Uh.re)
        return SplitC(re, im)

    def helmholtz_solve(self, accel0, visc, Bh: SplitC):
        """(accel0 M + visc K) Uh = Bh via the precomputed eigenbasis:
        Uh = P diag(1/(accel0 + visc lam)) P^H Bh.  ``accel0`` traced."""
        t = _cmatmul(self.PH, Bh, "xyab,xybd->xyad")
        scale = 1.0 / (accel0 + visc * self.lam)        # (nx, ny, 4)
        t = SplitC(t.re * scale[..., None], t.im * scale[..., None])
        return _cmatmul(self.P, t, "xyab,xybd->xyad")

    def mass_solve(self, Bh: SplitC):
        """M^{-1} = P P^H (the visc=0, accel0=1 eigen-solve)."""
        t = _cmatmul(self.PH, Bh, "xyab,xybd->xyad")
        return _cmatmul(self.P, t, "xyab,xybd->xyad")

    def poisson_solve(self, Rh: SplitC):
        return SplitC(self.Linv * Rh.re, self.Linv * Rh.im)


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

    def axpy(a, X: SplitC, Y):
        if Y is None:
            return SplitC(a * X.re, a * X.im)
        return SplitC(Y.re + a * X.re, Y.im + a * X.im)

    @jax.jit
    def step(state, alpha, eta, k=None):
        """``k``: optional traced step size (defaults to the built ``dt``;
        the eigenbasis Helmholtz solve makes variable steps an elementwise
        divide, never a refactorization)."""
        U, U_old, Uh, Uh_old, Ph = state
        a0, a1, a2 = alpha
        if k is None:
            k = dt

        # (1) Helmholtz: (a0/k M + nu K) u* = -(a1/k)M u - (a2/k)M u_old
        #                                     - C(extrapolated u) - G p
        U_ext = eta[0] * U + eta[1] * U_old
        Ch = ops.fwd_u(conv(U_ext))
        Bh = axpy(-(a1 / k), ops.mass(Uh), None)
        Bh = axpy(-(a2 / k), ops.mass(Uh_old), Bh)
        Bh = axpy(-1.0, Ch, Bh)
        Bh = axpy(-1.0, ops.grad(Ph), Bh)
        Ustar_h = ops.helmholtz_solve(a0 / k, visc, Bh)

        # (2) incremental pressure Poisson (exact, mean-free)
        Phi_h = ops.poisson_solve(axpy(a0 / k, ops.div(Ustar_h), None))

        # (3) velocity correction + pressure update
        Uh_new = axpy(-(k / a0), ops.mass_solve(ops.grad(Phi_h)), Ustar_h)
        Ph_new = SplitC(
            (Ph.re + Phi_h.re).at[0, 0].set(0.0),
            (Ph.im + Phi_h.im).at[0, 0].set(0.0))

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
