"""Host-side float64 residual assembly (NumPy).

Two jobs:

* the high-precision half of **mixed-precision iterative refinement** on
  TPU: the chip runs float32 Krylov (fast), the host evaluates the true
  float64 residual and accumulates the float64 iterate, so the
  reference's ||F|| <= 1e-10 contract
  (/root/reference/source/ns_solver_base.py:986-988) holds even though
  the accelerator has no fast float64 path (SURVEY.md hard part #5);
* an independent cross-check of the jitted device kernels (same math,
  different code path and arithmetic order).

Mirrors ``assembly/kernels.make_cell_residual`` term by term.
"""

from __future__ import annotations

import numpy as np

from navierstokes_tpu.fem.bcs import (WeakFormConvectiveTerm,
                                      WeakFormViscousTerm,
                                      parse_convective_form,
                                      parse_viscous_form)


def residual_f64(space, x, bc_dofs, bc_values, scalars, *,
                 form_convective_term="standard",
                 form_viscous_term="reduced", source_q=0.0,
                 extra_ru=None, mask_bcs=True) -> np.ndarray:
    """Assembled mixed residual in float64, vectorized NumPy.

    ``x``: (n_dofs,) float64 mixed vector; ``scalars``: the solver's
    coefficient dict (plain floats; ``cor`` optional); ``source_q``:
    scalar 0.0 or (nc, nq, d) float64 momentum source; ``extra_ru``:
    optional (n_unodes, d) float64 pre-scattered contribution.
    """
    conv_form = parse_convective_form(form_convective_term)
    visc_form = parse_viscous_form(form_viscous_term)
    dim = space.dim

    N2 = np.asarray(space.N2, dtype=np.float64)
    G2 = np.asarray(space.G2, dtype=np.float64)
    N1 = np.asarray(space.N1, dtype=np.float64)
    Jinv = np.asarray(space.Jinv_q, dtype=np.float64)
    W = np.asarray(space.integration_weights(), dtype=np.float64)
    cu = np.asarray(space.cell_unodes)
    cp_ = np.asarray(space.cell_pnodes)

    x = np.asarray(x, dtype=np.float64)
    u = x[:space.n_velocity_dofs].reshape(space.n_unodes, dim)
    p = x[space.n_velocity_dofs:]
    u_c = u[cu]                                        # (nc, nn2, d)
    p_c = p[cp_]

    cc = scalars.get("cc")
    cv = float(scalars["cv"])
    cp_coef = float(scalars["cp"])
    accel0 = float(scalars.get("accel0", 0.0))

    g2 = np.einsum("qia,cqae->cqie", G2, Jinv)
    v_q = np.einsum("qi,cid->cqd", N2, u_c)            # (nc, nq, d)
    grad_v = np.einsum("cid,cqie->cqde", u_c, g2)
    p_q = np.einsum("qj,cj->cq", N1, p_c)

    mom = accel0 * v_q + np.asarray(source_q, dtype=v_q.dtype)
    if cc is not None:
        cc = float(cc)
        if conv_form is WeakFormConvectiveTerm.standard_form:
            mom = mom + cc * np.einsum("cqde,cqe->cqd", grad_v, v_q)
        elif conv_form is WeakFormConvectiveTerm.rotational_form:
            if dim == 2:
                curl = grad_v[:, :, 1, 0] - grad_v[:, :, 0, 1]
                mom = mom + cc * np.stack(
                    [-curl * v_q[..., 1], curl * v_q[..., 0]], axis=-1)
            else:
                curl = np.stack(
                    [grad_v[:, :, 2, 1] - grad_v[:, :, 1, 2],
                     grad_v[:, :, 0, 2] - grad_v[:, :, 2, 0],
                     grad_v[:, :, 1, 0] - grad_v[:, :, 0, 1]], axis=-1)
                mom = mom + cc * np.cross(curl, v_q)
        elif conv_form is WeakFormConvectiveTerm.divergence_form:
            div_u = np.trace(grad_v, axis1=2, axis2=3)
            mom = mom + cc * (np.einsum("cqde,cqe->cqd", grad_v, v_q)
                              + 0.5 * div_u[..., None] * v_q)
        elif conv_form is WeakFormConvectiveTerm.skew_symmetric_form:
            mom = mom + 0.5 * cc * np.einsum("cqde,cqe->cqd", grad_v, v_q)
    if "cor" in scalars:
        cor = scalars["cor"]
        if dim == 2:
            mom = mom + float(cor) * np.stack(
                [-v_q[..., 1], v_q[..., 0]], axis=-1)
        else:
            mom = mom + np.cross(
                np.broadcast_to(np.asarray(cor, dtype=np.float64),
                                v_q.shape), v_q)

    if visc_form is WeakFormViscousTerm.traction_form:
        stress = cv * (grad_v + np.swapaxes(grad_v, 2, 3))
    else:
        stress = cv * grad_v
    stress = stress - cp_coef * p_q[..., None, None] * np.eye(dim)
    if cc is not None and \
            conv_form is WeakFormConvectiveTerm.skew_symmetric_form:
        stress = stress - 0.5 * cc * np.einsum("cqd,cqe->cqde", v_q, v_q)

    r_u_c = (np.einsum("cq,cqd,qi->cid", W, mom, N2)
             + np.einsum("cq,cqde,cqie->cid", W, stress, g2))
    div_v = np.trace(grad_v, axis1=2, axis2=3)
    r_p_c = -cp_coef * np.einsum("cq,cq,qj->cj", W, div_v, N1)

    r_u = np.zeros((space.n_unodes, dim))
    np.add.at(r_u, cu.ravel(), r_u_c.reshape(-1, dim))
    if extra_ru is not None:
        r_u = r_u + np.asarray(extra_ru, dtype=np.float64)
    r_p = np.zeros(space.n_pnodes)
    np.add.at(r_p, cp_.ravel(), r_p_c.reshape(-1))

    r = np.concatenate([r_u.reshape(-1), r_p])
    if mask_bcs:
        bc_dofs = np.asarray(bc_dofs)
        r[bc_dofs] = x[bc_dofs] - np.asarray(bc_values, dtype=np.float64)
    return r
