"""Block (PCD) preconditioning for the monolithic saddle-point system.

The Newton/Picard Jacobian has the block form

    J = [ F  G ]      F: velocity convection-diffusion(-reaction)
        [ D  0 ]      G: pressure gradient, D: divergence

(with identity rows mixed in at Dirichlet dofs).  The PCD
(pressure-convection-diffusion, Kay/Loghin/Wathen; see PAPERS.md)
right preconditioner approximates

    P^{-1} [r_u, r_p]:
        z_p = -S^{-1} r_p,   S^{-1} ~= Lp^{-1} Fp Mp^{-1}
        z_u = F^{-1} (r_u - G z_p)

where Lp / Mp are the pressure Laplacian / mass and
Fp = accel0 Mp + nu Lp + N_p(u) is the pressure-space
convection-diffusion operator.  All sub-solves are fixed-iteration
Jacobi-CG / BiCGStab sweeps on device -- this replaces the reference's
PETSc direct LU (ns_solver_base.py:938) for problem sizes where a
factorization is impossible, and is SURVEY.md "hard part #1".
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.assembly.operators import (MixedOperator,
                                                 PressurePoissonOperator)
from navierstokes_tpu.linalg.krylov import cg, bicgstab


class PCDPreconditioner:
    """PCD application bound to a mixed operator + current state."""

    def __init__(self, mixed_op: MixedOperator, J_matvec, *, visc, accel0,
                 u_current, f_iters=8, lp_iters=25, mp_iters=4):
        space = mixed_op.space
        self.n_u = space.n_velocity_dofs
        self.n_p = space.n_pnodes
        self.J = J_matvec
        self.f_iters = f_iters
        self.lp_iters = lp_iters
        self.mp_iters = mp_iters

        self.pop = PressurePoissonOperator(space)
        self.u_q = mixed_op.u_at_quad(u_current)
        self.visc = visc
        self.accel0 = accel0

        # pressure dofs constrained in J (pins / pressure Dirichlet): the
        # preconditioner acts as identity there
        bc = np.asarray(mixed_op._bc_dofs_np)
        p_bc = bc[bc >= self.n_u] - self.n_u
        mask = np.zeros(self.n_p, dtype=bool)
        mask[p_bc] = True
        self.p_bc_mask = jnp.asarray(mask)
        self.p_free = jnp.where(self.p_bc_mask, 0.0, 1.0)
        self.enclosed = len(p_bc) == 0

        u_bc = bc[bc < self.n_u]
        vmask = np.zeros(self.n_u, dtype=bool)
        vmask[u_bc] = True
        self.u_free = jnp.where(jnp.asarray(vmask), 0.0, 1.0)

        import jax

        self.apply = jax.jit(self._apply_impl)

    # -- block applies through the full Jacobian ------------------------------
    def _F_apply(self, v):
        x = jnp.concatenate([v, jnp.zeros(self.n_p, dtype=v.dtype)])
        return self.J(x)[:self.n_u]

    def _G_apply(self, p):
        x = jnp.concatenate([jnp.zeros(self.n_u, dtype=p.dtype), p])
        return self.J(x)[:self.n_u]

    # -- pressure-space solves -------------------------------------------------
    def _project(self, r):
        if self.enclosed:
            return r - jnp.mean(r)
        return self.p_free * r

    def _lp_solve(self, r):
        r = self._project(r)

        def A(v):
            y = self.pop.stiffness_matvec(self._project(v))
            return self._project(y) + (1.0 - self.p_free) * v \
                if not self.enclosed else self._project(y)

        x, _ = cg(A, r, tol=0.0, maxiter=self.lp_iters)
        return self._project(x)

    def _mp_solve(self, r):
        x, _ = cg(self.pop.mass_matvec, r, tol=0.0, maxiter=self.mp_iters)
        return x

    def _fp_apply(self, p):
        return (self.accel0 * self.pop.mass_matvec(p)
                + self.visc * self.pop.stiffness_matvec(p)
                + self.pop.convection_matvec(p, self.u_q))

    # -- the preconditioner ------------------------------------------------------
    def _apply_impl(self, r):
        r_u, r_p = r[:self.n_u], r[self.n_u:]
        # Schur approximation: S^{-1} ~= Lp^{-1} Fp Mp^{-1}
        z_p = -self._lp_solve(self._fp_apply(self._mp_solve(r_p)))
        z_p = jnp.where(self.p_bc_mask, r_p, z_p)
        # velocity solve: F z_u = r_u - G z_p (inexact BiCGStab sweep)
        rhs = r_u - self._G_apply(z_p)
        z_u, _ = bicgstab(self._F_apply, rhs, tol=0.0,
                          maxiter=self.f_iters)
        z_u = self.u_free * z_u + (1.0 - self.u_free) * rhs
        return jnp.concatenate([z_u, z_p])
