"""Cell-parallel (domain-decomposed) assembly over a device mesh.

Strategy (round 1): **cell sharding with replicated dof vectors** -- the
FEM analogue of data parallelism.  The element loop dominates matrix-free
Krylov cost, and its scatter is a sum over disjoint cell batches:

    r = sum_d scatter(elements of shard d)         (psum over the mesh)

Each device holds an equal chunk of the per-cell arrays (gather maps,
geometry, quadrature weights); solution vectors are replicated.  The only
collective is one ``psum`` per operator application, riding ICI.  Mesh
partitioning keeps spatially contiguous chunks (cells are generated
lexicographically) so gather locality is preserved.

Later rounds: row-partitioned dof sharding with ``ppermute`` halo exchange
for memory-bound scaling beyond replicated vectors.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from navierstokes_tpu import config
from navierstokes_tpu.assembly import kernels
from navierstokes_tpu.fem.spaces import TaylorHoodSpace


def device_mesh(n_devices=None, axis="shard"):
    """1D device mesh over the first ``n_devices`` available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _pad_cells(arr, n_pad):
    """Pad the leading (cell) axis with repeats of cell 0, weight-zeroed
    separately."""
    if n_pad == 0:
        return arr
    pad = jnp.repeat(arr[:1], n_pad, axis=0)
    return jnp.concatenate([arr, pad], axis=0)


class ShardedCellOperator:
    """Sharded residual / matvec kernels for a Taylor-Hood space.

    Builds jitted, ``shard_map``-ped versions of the hot operators:

    * ``stokes_matvec(x)``     -- matrix-free monolithic Stokes/Oseen apply
    * ``pressure_stiffness(p)``-- P1 Laplacian apply (IPCS projection)
    * ``velocity_mass(u)``     -- P2 vector mass apply (IPCS correction)

    Dof vectors are replicated; per-cell data is sharded on ``axis``.
    """

    def __init__(self, space: TaylorHoodSpace, mesh: Mesh, axis="shard"):
        self.space = space
        self.mesh = mesh
        self.axis = axis
        n_dev = mesh.devices.size
        dt = config.default_dtype()

        nc = space.mesh.n_cells
        n_pad = (-nc) % n_dev
        self.n_cells_padded = nc + n_pad

        W = np.asarray(space.integration_weights(), dtype=dt)
        if n_pad:
            # padded cells carry zero quadrature weight: no contribution
            W = np.concatenate([W, np.zeros((n_pad, W.shape[1]), dtype=dt)])
        self.W = jnp.asarray(W)
        self.Jinv = _pad_cells(jnp.asarray(space.Jinv, dtype=dt), n_pad)
        self.cell_unodes = _pad_cells(jnp.asarray(space.cell_unodes), n_pad)
        self.cell_pnodes = _pad_cells(jnp.asarray(space.cell_pnodes), n_pad)

        self.N2 = jnp.asarray(space.N2, dtype=dt)
        self.G2 = jnp.asarray(space.G2, dtype=dt)
        self.N1 = jnp.asarray(space.N1, dtype=dt)

        self._shard_spec = P(axis)
        self._repl = P()

    def _shard(self, fn, n_out=1):
        """shard_map wrapper: cell arrays sharded, vectors replicated."""
        in_specs = (self._shard_spec,) * 4 + (self._repl,)
        out_specs = self._repl if n_out == 1 else (self._repl,) * n_out
        return shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)

    # -- monolithic Stokes-like matvec (diffusion + pressure coupling) ------
    def make_stokes_matvec(self, visc, cp=1.0, accel0=0.0):
        """Matrix-free apply of the (linear) Stokes/Helmholtz saddle-point
        operator: viscous + pressure-gradient/divergence + optional mass
        shift (accel0) -- the backbone of block-preconditioned Krylov."""
        space = self.space
        dim = space.dim
        axis = self.axis

        def local(cell_unodes, cell_pnodes, Jinv, W, x):
            u = x[:space.n_velocity_dofs].reshape(-1, dim)
            p = x[space.n_velocity_dofs:]
            u_c = u[cell_unodes]
            p_c = p[cell_pnodes]
            g2 = jnp.einsum("qia,cae->cqie", self.G2, Jinv)
            u_q = jnp.einsum("qi,cid->cqd", self.N2, u_c)
            grad_u = jnp.einsum("cid,cqie->cqde", u_c, g2)
            p_q = jnp.einsum("qj,cj->cq", self.N1, p_c)
            div_u = jnp.trace(grad_u, axis1=2, axis2=3)

            stress = visc * grad_u \
                - cp * p_q[:, :, None, None] * jnp.eye(dim)
            mom = accel0 * u_q
            r_u_c = (jnp.einsum("cq,cqd,qi->cid", W, mom, self.N2)
                     + jnp.einsum("cq,cqde,cqie->cid", W, stress, g2))
            r_p_c = -cp * jnp.einsum("cq,cq,qj->cj", W, div_u, self.N1)

            r_u = kernels.scatter_unodes(r_u_c, cell_unodes, space.n_unodes)
            r_p = kernels.scatter_pnodes(r_p_c, cell_pnodes, space.n_pnodes)
            r = jnp.concatenate([r_u.reshape(-1), r_p])
            return jax.lax.psum(r, axis)

        sharded = self._shard(local)

        def matvec(x):
            return sharded(self.cell_unodes, self.cell_pnodes, self.Jinv,
                           self.W, x)

        return jax.jit(matvec)

    # -- P1 pressure Laplacian ----------------------------------------------
    def make_pressure_stiffness(self):
        space = self.space
        axis = self.axis
        G1 = jnp.asarray(space.G1, dtype=self.W.dtype)

        def local(cell_unodes, cell_pnodes, Jinv, W, p):
            g1 = jnp.einsum("qja,cae->cqje", G1, Jinv)
            grad_p = jnp.einsum("cj,cqje->cqe", p[cell_pnodes], g1)
            r_c = jnp.einsum("cq,cqe,cqje->cj", W, grad_p, g1)
            r = kernels.scatter_pnodes(r_c, cell_pnodes, space.n_pnodes)
            return jax.lax.psum(r, axis)

        sharded = self._shard(local)

        def matvec(p):
            return sharded(self.cell_unodes, self.cell_pnodes, self.Jinv,
                           self.W, p)

        return jax.jit(matvec)

    # -- P2 vector mass ------------------------------------------------------
    def make_velocity_mass(self):
        space = self.space
        axis = self.axis
        dim = space.dim

        def local(cell_unodes, cell_pnodes, Jinv, W, uflat):
            u = uflat.reshape(-1, dim)
            u_q = jnp.einsum("qi,cid->cqd", self.N2, u[cell_unodes])
            r_c = jnp.einsum("cq,cqd,qi->cid", W, u_q, self.N2)
            r = kernels.scatter_unodes(r_c, cell_unodes, space.n_unodes)
            return jax.lax.psum(r.reshape(-1), axis)

        sharded = self._shard(local)

        def matvec(uflat):
            return sharded(self.cell_unodes, self.cell_pnodes, self.Jinv,
                           self.W, uflat)

        return jax.jit(matvec)

    # -- explicit convection RHS --------------------------------------------
    def make_convection_rhs(self, cc):
        """b_i = integral(cc * (u . grad)u . N_i): explicit convection
        assembly for semi-implicit (IMEX) stepping (the scheme of the
        reference's prototype scripts/test_ipcs.py:102-133)."""
        space = self.space
        axis = self.axis
        dim = space.dim

        def local(cell_unodes, cell_pnodes, Jinv, W, uflat):
            u = uflat.reshape(-1, dim)
            u_c = u[cell_unodes]
            g2 = jnp.einsum("qia,cae->cqie", self.G2, Jinv)
            u_q = jnp.einsum("qi,cid->cqd", self.N2, u_c)
            grad_u = jnp.einsum("cid,cqie->cqde", u_c, g2)
            conv = cc * jnp.einsum("cqde,cqe->cqd", grad_u, u_q)
            r_c = jnp.einsum("cq,cqd,qi->cid", W, conv, self.N2)
            r = kernels.scatter_unodes(r_c, cell_unodes, space.n_unodes)
            return jax.lax.psum(r.reshape(-1), axis)

        sharded = self._shard(local)

        def rhs(uflat):
            return sharded(self.cell_unodes, self.cell_pnodes, self.Jinv,
                           self.W, uflat)

        return jax.jit(rhs)
