"""Derived-field computation: vorticity, pressure gradient, stream
potential, CFL numbers.

Counterparts of the reference's ProblemBase postprocessing
(source/ns_problem.py:55-172 and :554-587):

* vorticity: cell-local L2 projection of curl(u) onto DG(1) -- small
  batched dense solves replace dolfin's project/LocalSolver;
* pressure gradient: DG(0) cell averages of grad(p);
* stream potential: CG1 Poisson solve with homogeneous Dirichlet data on
  no-slip walls and -u.n Neumann data elsewhere;
* CFL: max over quadrature points of deg * |u| * dt / h.

Each also offers vertex-averaged values for visualization output.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.assembly.operators import (MixedOperator,
                                                 PressurePoissonOperator)


def _dg1_project(op: MixedOperator, values_q):
    """Cell-local L2 projection of (nc, nq) data onto DG1 -> (nc, nn1)."""
    N1 = jnp.asarray(op.space.N1, dtype=values_q.dtype)
    M = jnp.einsum("cq,qi,qj->cij", op.W, N1, N1)
    b = jnp.einsum("cq,cq,qj->cj", op.W, values_q, N1)
    return jnp.linalg.solve(M, b[..., None])[..., 0]


def _vertex_average(mesh, cell_vertex_values):
    """Average duplicated DG vertex values onto mesh vertices (nc, d+1)."""
    nv = mesh.n_vertices
    accum = np.zeros(nv)
    count = np.zeros(nv)
    np.add.at(accum, mesh.cells.ravel(),
              np.asarray(cell_vertex_values).ravel())
    np.add.at(count, mesh.cells.ravel(), 1.0)
    return accum / np.maximum(count, 1.0)


def vorticity(op: MixedOperator, u):
    """2D: scalar curl as DG1 coefficients (nc, 3); 3D: (nc, nn1, 3)."""
    g = op.grad_u_at_quad(u)
    if op.dim == 2:
        curl_q = g[:, :, 1, 0] - g[:, :, 0, 1]
        return _dg1_project(op, curl_q)
    comps = [g[:, :, 2, 1] - g[:, :, 1, 2],
             g[:, :, 0, 2] - g[:, :, 2, 0],
             g[:, :, 1, 0] - g[:, :, 0, 1]]
    return jnp.stack([_dg1_project(op, c) for c in comps], axis=-1)


def vorticity_vertex_field(op: MixedOperator, u):
    w = vorticity(op, u)
    if op.dim == 2:
        return _vertex_average(op.space.mesh, w)
    return np.stack([_vertex_average(op.space.mesh, w[..., k])
                     for k in range(3)], axis=-1)


def pressure_gradient(op: MixedOperator, p):
    """DG0 (cellwise-average) pressure gradient (nc, d)."""
    grad_q = op.grad_p_at_quad(p)
    vol = jnp.sum(op.W, axis=1)
    return jnp.einsum("cq,cqe->ce", op.W, grad_q) / vol[:, None]


def cfl_number(op: MixedOperator, u, step_size: float, degree: int = 2):
    """max over quadrature points of deg * |u| * dt / h_cell.

    One jitted program per (operator, degree): this runs every time step,
    and a chain of eager ops would be round-trip-bound on a remote device.
    """
    import jax

    def build():
        h = jnp.asarray(op.space.mesh.cell_diameters)

        @jax.jit
        def impl(u, step_size):
            u_q = op.u_at_quad(u)
            speed = jnp.sqrt(jnp.sum(u_q ** 2, axis=-1))
            cfl = degree * speed * step_size / h.astype(speed.dtype)[:, None]
            return jnp.max(cfl)

        return impl

    fn = op._get_jit(("cfl", degree), build)
    return float(fn(u, step_size))


def stream_potential(op: MixedOperator, u, markers, dirichlet_ids,
                     neumann_ids, tol=1e-12):
    """CG1 potential phi: lap(phi) = div(u), phi=0 on no-slip walls,
    d(phi)/dn = -u.n on the remaining boundaries (reference
    ns_problem.py:104-172).  Returns nodal values on pressure dofs."""
    from navierstokes_tpu.linalg.krylov import masked_spd_solve

    space = op.space
    pop = PressurePoissonOperator(space)

    div_q = jnp.trace(op.grad_u_at_quad(u), axis1=2, axis2=3)
    rhs = pop.rhs_scalar(div_q)

    for bid in neumann_ids:
        fids = markers.ids_with_value(bid)
        if len(fids) == 0:
            continue
        batch = space.facet_batch(fids)
        dev = op.facet_batch_device(batch)
        u_q = jnp.einsum("fqi,fid->fqd", dev["N2"], u[dev["cell_unodes"]])
        un = jnp.einsum("fqd,fqd->fq", u_q, dev["normals"])
        contrib_c = -jnp.einsum("fq,fq,fqj->fj", dev["weights"], un,
                                dev["N1"])
        rhs = rhs + jnp.zeros_like(rhs).at[dev["cell_pnodes"]].add(contrib_c)

    mask = np.zeros(space.n_pnodes, dtype=bool)
    got_dirichlet = False
    for bid in dirichlet_ids:
        fids = markers.ids_with_value(bid)
        if len(fids):
            mask[np.asarray(space.facet_pnodes(fids))] = True
            got_dirichlet = True
    if not got_dirichlet:
        mask[0] = True  # pure-Neumann: pin the constant
    zeros = jnp.zeros(space.n_pnodes, dtype=rhs.dtype)
    phi, _ = masked_spd_solve(pop.stiffness_matvec, rhs, jnp.asarray(mask),
                              zeros, tol=tol)
    return phi
