"""Batched element kernels for the incompressible Navier-Stokes weak forms.

Each kernel computes one cell's residual contribution from tabulated shape
functions; ``jax.vmap`` batches over cells and ``jax.jacfwd`` derives exact
element Jacobians (replacing UFL/FFC kernel generation and symbolic
``dlfn.derivative``, reference: source/ns_solver_base.py:370-499,662-673,
913-936).

Term catalogue and sign conventions follow the reference residual F(x) = 0:

    mass:       - c_p * div(u) * q
    momentum:   accel0 * u . w  +  source . w  +  convective(u) . w
                + coriolis(u) . w  - c_p * p * div(w) + viscous(u) : grad(w)
    boundary:   + traction . w   on marked facets      (reference :121-156)

``source`` bundles every u-independent momentum contribution (BDF history
sum, body force with its minus sign, Euler acceleration), precomputed at
quadrature points outside the kernel.

Convective forms (John 2016, pp. 307-308) and their Picard linearizations
mirror ns_solver_base.py:370-390 and :478-499.  The Picard form
deliberately omits the Coriolis term, like the reference's hand-built
Picard Jacobian (ns_solver_base.py:930-934).
"""

from __future__ import annotations

import jax.numpy as jnp

from navierstokes_tpu.fem.bcs import (WeakFormConvectiveTerm,
                                      WeakFormViscousTerm)


def _convective_momentum(form, cc, u_q, grad_u, v_q, grad_v, dim):
    """Momentum-term (dot w) part of the convective form.

    ``u`` is the advecting (frozen) field, ``v`` the transported (trial)
    field; Newton mode passes v = u.  Returns (nq, d).
    """
    if form is WeakFormConvectiveTerm.standard_form:
        return cc * jnp.einsum("qde,qe->qd", grad_v, u_q)
    if form is WeakFormConvectiveTerm.rotational_form:
        if dim == 2:
            curl = grad_u[:, 1, 0] - grad_u[:, 0, 1]
            return cc * jnp.stack([-curl * v_q[:, 1], curl * v_q[:, 0]],
                                  axis=1)
        curl = jnp.stack([grad_u[:, 2, 1] - grad_u[:, 1, 2],
                          grad_u[:, 0, 2] - grad_u[:, 2, 0],
                          grad_u[:, 1, 0] - grad_u[:, 0, 1]], axis=1)
        return cc * jnp.cross(curl, v_q)
    if form is WeakFormConvectiveTerm.divergence_form:
        div_u = jnp.trace(grad_u, axis1=1, axis2=2)
        return cc * (jnp.einsum("qde,qe->qd", grad_v, u_q)
                     + 0.5 * div_u[:, None] * v_q)
    if form is WeakFormConvectiveTerm.skew_symmetric_form:
        return 0.5 * cc * jnp.einsum("qde,qe->qd", grad_v, u_q)
    raise ValueError(form)  # pragma: no cover


def _convective_stress(form, cc, u_q, v_q):
    """grad(w)-tested part of the convective form (skew-symmetric only)."""
    if form is WeakFormConvectiveTerm.skew_symmetric_form:
        # -c/2 * (grad(w) . u) . v  ->  stress[d,e] -= c/2 * v[d] u[e]
        return -0.5 * cc * jnp.einsum("qd,qe->qde", v_q, u_q)
    return None


def make_cell_residual(N2, G2, N1, dim, conv_form, visc_form,
                       with_coriolis):
    """Factory for the single-cell mixed residual.

    Returns ``cell_residual(u_c, p_c, uf_c, Jinv, W, source_q, scalars,
    picard)`` -> (r_u (nn2, d), r_p (nn1,)), where

      u_c (nn2, d): trial velocity coefficients
      p_c (nn1,):   trial pressure coefficients
      uf_c:         frozen advection velocity (Picard); ignored for Newton
      Jinv (nq, d, d), W (nq,): cell geometry at quadrature points
        (weights include |det J(xi_q)|; isoparametric cells supported)
      source_q (nq, d): precomputed u-independent momentum source
      scalars: dict of traced coefficients
        cc, cv, cp, accel0, cor (2*coriolis_coeff*omega; 3D: vector)
      picard (static bool): Picard linearization vs. full nonlinear form
    """
    N2 = jnp.asarray(N2)
    G2 = jnp.asarray(G2)
    N1 = jnp.asarray(N1)

    def cell_residual(u_c, p_c, uf_c, Jinv, W, source_q, scalars,
                      picard: bool):
        cc = scalars["cc"]
        cv = scalars["cv"]
        cp = scalars["cp"]
        accel0 = scalars["accel0"]

        g2 = jnp.einsum("qia,qae->qie", G2, Jinv)    # phys grads of P2
        v_q = N2 @ u_c                                # (nq, d) trial
        grad_v = jnp.einsum("id,qie->qde", u_c, g2)
        p_q = N1 @ p_c

        if picard:
            u_q = N2 @ uf_c
            grad_u = jnp.einsum("id,qie->qde", uf_c, g2)
        else:
            u_q, grad_u = v_q, grad_v

        # momentum terms tested with w
        mom = accel0 * v_q + source_q
        if cc is not None:
            mom = mom + _convective_momentum(conv_form, cc, u_q, grad_u,
                                             v_q, grad_v, dim)
        if with_coriolis and not picard:
            cor = scalars["cor"]
            if dim == 2:
                mom = mom + cor * jnp.stack([-v_q[:, 1], v_q[:, 0]], axis=1)
            else:
                mom = mom + jnp.cross(
                    jnp.broadcast_to(cor, v_q.shape), v_q)

        # stress terms tested with grad(w)
        if visc_form is WeakFormViscousTerm.traction_form:
            stress = cv * (grad_v + jnp.swapaxes(grad_v, 1, 2))
        else:
            stress = cv * grad_v
        stress = stress - cp * p_q[:, None, None] * jnp.eye(dim)
        if cc is not None:
            extra = _convective_stress(conv_form, cc, u_q, v_q)
            if extra is not None:
                stress = stress + extra

        r_u = (jnp.einsum("q,qd,qi->id", W, mom, N2)
               + jnp.einsum("q,qde,qie->id", W, stress, g2))

        div_v = jnp.trace(grad_v, axis1=1, axis2=2)
        r_p = -cp * jnp.einsum("q,q,qj->j", W, div_v, N1)
        return r_u, r_p

    return cell_residual


def make_velocity_cell_residual(N2, G2, N1, dim, conv_form, visc_form):
    """Single-cell residual of the IPCS diffusion step (velocity unknown).

    ``cell_residual(u_c, uf_c, Jinv, W, source_q, p_old_c, scalars, picard)``
    -> r_u (nn2, d).  The lagged pressure enters via
    ``- c_p * p_old * div(w)`` (reference: ns_ipcs_solver.py:126-130).
    """
    N2 = jnp.asarray(N2)
    G2 = jnp.asarray(G2)
    N1 = jnp.asarray(N1)

    def cell_residual(u_c, uf_c, Jinv, W, source_q, p_old_c, scalars,
                      picard: bool):
        cc = scalars["cc"]
        cv = scalars["cv"]
        cp = scalars["cp"]
        accel0 = scalars["accel0"]

        g2 = jnp.einsum("qia,qae->qie", G2, Jinv)
        v_q = N2 @ u_c
        grad_v = jnp.einsum("id,qie->qde", u_c, g2)
        if picard:
            u_q = N2 @ uf_c
            grad_u = jnp.einsum("id,qie->qde", uf_c, g2)
        else:
            u_q, grad_u = v_q, grad_v
        p_q = N1 @ p_old_c

        mom = accel0 * v_q + source_q
        if cc is not None:
            mom = mom + _convective_momentum(conv_form, cc, u_q, grad_u,
                                             v_q, grad_v, dim)
        if visc_form is WeakFormViscousTerm.traction_form:
            stress = cv * (grad_v + jnp.swapaxes(grad_v, 1, 2))
        else:
            stress = cv * grad_v
        stress = stress - cp * p_q[:, None, None] * jnp.eye(dim)
        if cc is not None:
            extra = _convective_stress(conv_form, cc, u_q, v_q)
            if extra is not None:
                stress = stress + extra

        return (jnp.einsum("q,qd,qi->id", W, mom, N2)
                + jnp.einsum("q,qde,qie->id", W, stress, g2))

    return cell_residual


# ---------------------------------------------------------------------------
# simple bilinear element matrices (assembled once; SPD systems)
# ---------------------------------------------------------------------------

def p1_stiffness_elements(G1, Jinv, W):
    """(nc, nn1, nn1) element matrices of  (grad p, grad q).

    ``Jinv``: per-quadrature-point inverse Jacobians (nc, nq, d, d)."""
    g1 = jnp.einsum("qia,cqae->cqie", jnp.asarray(G1), Jinv)
    return jnp.einsum("cq,cqie,cqje->cij", W, g1, g1)


def p1_mass_elements(N1, W):
    N1 = jnp.asarray(N1)
    return jnp.einsum("cq,qi,qj->cij", W, N1, N1)


def p2_mass_elements(N2, W):
    N2 = jnp.asarray(N2)
    return jnp.einsum("cq,qi,qj->cij", W, N2, N2)


def p2_vector_mass_apply(N2, W, cell_unodes, u, n_unodes):
    """y = M u for the P2 vector mass matrix, matrix-free."""
    N2 = jnp.asarray(N2)
    u_c = u[cell_unodes]                              # (nc, nn2, d)
    u_q = jnp.einsum("qi,cid->cqd", N2, u_c)
    r_c = jnp.einsum("cq,cqd,qi->cid", W, u_q, N2)
    return scatter_unodes(r_c, cell_unodes, n_unodes)


def scatter_unodes(r_c, cell_unodes, n_unodes):
    """Accumulate per-cell (nc, nn, d) node contributions into (n_unodes, d)."""
    d = r_c.shape[-1]
    flat = jnp.zeros((n_unodes, d), dtype=r_c.dtype)
    return flat.at[cell_unodes].add(r_c)


def scatter_pnodes(r_c, cell_pnodes, n_pnodes):
    flat = jnp.zeros((n_pnodes,), dtype=r_c.dtype)
    return flat.at[cell_pnodes].add(r_c)
