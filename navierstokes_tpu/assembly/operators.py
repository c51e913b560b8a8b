"""Global operators: residual/Jacobian assembly bound to a Taylor-Hood space.

``MixedOperator`` is the device-side counterpart of the reference's
SystemAssembler+forms bundle (source/auxiliary_classes.py:120-164 plus the
form construction in ns_solver_base.py:894-949): jitted residual
evaluation, jitted sparse/dense Jacobian assembly (Newton via ``jacfwd``,
Picard via the hand-linearized forms), Dirichlet row handling, boundary
tractions, L2 projections and functionals.

``VelocityOperator`` is the velocity-subspace analogue used by the IPCS
diffusion step (reference: ns_ipcs_solver.py:106-147).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from navierstokes_tpu import config
from navierstokes_tpu.assembly import kernels, sparse
from navierstokes_tpu.fem.bcs import parse_convective_form, parse_viscous_form
from navierstokes_tpu.fem.spaces import TaylorHoodSpace


def _dtype():
    return config.default_dtype()


class MixedOperator:
    """Residual/Jacobian of the mixed (monolithic) Navier-Stokes system."""

    def __init__(self, space: TaylorHoodSpace, form_convective_term="standard",
                 form_viscous_term="reduced", with_coriolis=False):
        config.ensure_accurate_matmuls()
        self.space = space
        self.dim = space.dim
        self.conv_form = parse_convective_form(form_convective_term)
        self.visc_form = parse_viscous_form(form_viscous_term)
        self.with_coriolis = with_coriolis

        dt = _dtype()
        self.Jinv = jnp.asarray(space.Jinv_q, dtype=dt)
        self.W = jnp.asarray(space.integration_weights(), dtype=dt)
        self.cell_unodes = jnp.asarray(space.cell_unodes)
        self.cell_pnodes = jnp.asarray(space.cell_pnodes)

        d = space.dim
        nn2 = space.cell_unodes.shape[1]
        nn1 = space.cell_pnodes.shape[1]
        udofs = (space.cell_unodes[:, :, None] * d
                 + np.arange(d)[None, None, :])            # (nc, nn2, d)
        pdofs = space.cell_pnodes + space.pressure_offset
        self.cell_dofs_np = np.concatenate(
            [udofs.reshape(len(udofs), -1), pdofs], axis=1).astype(np.int64)
        self.cell_dofs = jnp.asarray(self.cell_dofs_np)
        self.n_loc = self.cell_dofs_np.shape[1]
        self.nu_loc = nn2 * d

        self.pattern = sparse.build_pattern(self.cell_dofs_np, space.n_dofs)

        self._cell_residual = kernels.make_cell_residual(
            space.N2, space.G2, space.N1, d, self.conv_form, self.visc_form,
            with_coriolis)

        self._bc_dofs = jnp.zeros((0,), dtype=jnp.int32)
        self._bc_mask_nnz = None
        self._bc_diag_slots = None

        self._jit_cache = {}

    # -- Dirichlet wiring ---------------------------------------------------
    def set_bc_dofs(self, bc_dofs: np.ndarray) -> None:
        self._bc_dofs_np = np.asarray(bc_dofs, dtype=np.int32)
        self._bc_dofs = jnp.asarray(self._bc_dofs_np)
        mask, diag = sparse.bc_row_masks(self.pattern, self._bc_dofs_np)
        self._bc_mask_nnz = jnp.asarray(mask)
        self._bc_diag_slots = jnp.asarray(diag)
        self._jit_cache.clear()

    @property
    def bc_dofs(self):
        return self._bc_dofs

    # -- helpers -------------------------------------------------------------
    def split(self, x):
        return self.space.split(x)

    def u_at_quad(self, u):
        """(nc, nq, d) velocity values at volume quadrature points."""
        N2 = jnp.asarray(self.space.N2, dtype=_dtype())
        return jnp.einsum("qi,cid->cqd", N2, u[self.cell_unodes])

    def grad_u_at_quad(self, u):
        G2 = jnp.asarray(self.space.G2, dtype=_dtype())
        g2 = jnp.einsum("qia,cqae->cqie", G2, self.Jinv)
        return jnp.einsum("cid,cqie->cqde", u[self.cell_unodes], g2)

    def p_at_quad(self, p):
        N1 = jnp.asarray(self.space.N1, dtype=_dtype())
        return jnp.einsum("qj,cj->cq", N1, p[self.cell_pnodes])

    def grad_p_at_quad(self, p):
        G1 = jnp.asarray(self.space.G1, dtype=_dtype())
        g1 = jnp.einsum("qja,cqae->cqje", G1, self.Jinv)
        return jnp.einsum("cj,cqje->cqe", p[self.cell_pnodes], g1)

    def quad_coords(self):
        return jnp.asarray(self.space.quad_coords(), dtype=_dtype())

    # -- residual ------------------------------------------------------------
    def _get_jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def residual(self, x, bc_values, scalars, source_q=0.0, extra_ru=None,
                 mask_bcs=True):
        """Assembled residual with Dirichlet masking r[bc] = x[bc] - g.

        ``extra_ru``: optional (n_unodes, d) pre-scattered velocity residual
        contribution (boundary tractions).  ``mask_bcs=False`` returns the
        raw assembled residual -- its values at constrained velocity nodes
        are the nodal *reaction forces* (used for superconvergent drag/lift
        evaluation).
        """
        fn = self._get_jit(("residual", extra_ru is not None,
                            np.shape(source_q) == (), bool(mask_bcs)),
                           lambda: self._build_residual(bool(mask_bcs)))
        if extra_ru is None:
            return fn(x, bc_values, scalars, source_q)
        return fn(x, bc_values, scalars, source_q, extra_ru)

    def _build_residual(self, mask_bcs=True):
        space = self.space

        def impl(x, bc_values, scalars, source_q, extra_ru=None):
            u, p = space.split(x)
            u_c = u[self.cell_unodes]
            p_c = p[self.cell_pnodes]
            src = source_q

            def one(u_cc, p_cc, Ji, Wc, sq):
                return self._cell_residual(u_cc, p_cc, u_cc, Ji, Wc, sq,
                                           scalars, False)

            in_axes = (0, 0, 0, 0, 0 if np.ndim(source_q) == 3 else None)
            r_u_c, r_p_c = jax.vmap(one, in_axes=in_axes)(
                u_c, p_c, self.Jinv, self.W, src)
            r_u = kernels.scatter_unodes(r_u_c, self.cell_unodes,
                                         space.n_unodes)
            if extra_ru is not None:
                r_u = r_u + extra_ru
            r_p = kernels.scatter_pnodes(r_p_c, self.cell_pnodes,
                                         space.n_pnodes)
            r = jnp.concatenate([r_u.reshape(-1), r_p])
            if not mask_bcs:
                return r
            return r.at[self._bc_dofs].set(x[self._bc_dofs] - bc_values)

        return jax.jit(impl)

    def linearize_at(self, x, scalars, source_q=0.0, picard=False):
        """Matrix-free Jacobian action J(x) @ v via ``jax.linearize``.

        Returns ``(r, jvp)`` where ``jvp(v)`` applies the Newton (or
        Picard, with the advecting field frozen at ``x``) Jacobian of the
        *masked* residual -- identity rows at Dirichlet dofs, matching the
        assembled path (:meth:`jacobian_csr`).  Call inside a jit trace:
        the linearization point is computed once, each ``jvp`` costs one
        residual-like sweep, and no CSR is ever formed.  This is the
        at-scale replacement for per-cell ``jacfwd`` + CSR assembly
        (reference counterpart: the SystemAssembler+LU Newton of
        ns_solver_base.py:938-988).
        """
        space = self.space
        u_frozen, _ = space.split(x)
        uf_c = u_frozen[self.cell_unodes]
        in_axes = (0, 0, 0, 0, 0, 0 if np.ndim(source_q) == 3 else None)

        def masked_residual(z):
            u, p = space.split(z)
            u_c = u[self.cell_unodes]
            p_c = p[self.cell_pnodes]

            def one(u_cc, p_cc, uf_cc, Ji, Wc, sq):
                return self._cell_residual(u_cc, p_cc, uf_cc, Ji, Wc, sq,
                                           scalars, picard)

            r_u_c, r_p_c = jax.vmap(one, in_axes=in_axes)(
                u_c, p_c, uf_c, self.Jinv, self.W, source_q)
            r_u = kernels.scatter_unodes(r_u_c, self.cell_unodes,
                                         space.n_unodes)
            r_p = kernels.scatter_pnodes(r_p_c, self.cell_pnodes,
                                         space.n_pnodes)
            r = jnp.concatenate([r_u.reshape(-1), r_p])
            # bc offset (z[bc] - g) differentiates to identity rows; the
            # constant g does not affect the jvp, so it is omitted here
            return r.at[self._bc_dofs].set(z[self._bc_dofs])

        return jax.linearize(masked_residual, x)

    def velocity_jacobi_diags(self):
        """Per-scalar-node diagonals of the P2 vector mass and stiffness.

        Building blocks of the Jacobi diagonal of the velocity
        convection-diffusion-reaction block: diag(F) ~= accel0 * dm +
        visc * dk (convection contributes nothing to the diagonal in the
        standard form).  Used by the matrix-free PCD preconditioner.
        """
        N2 = jnp.asarray(self.space.N2, dtype=_dtype())
        G2 = jnp.asarray(self.space.G2, dtype=_dtype())
        g2 = jnp.einsum("qia,cqae->cqie", G2, self.Jinv)
        dk_c = jnp.einsum("cq,cqie,cqie->ci", self.W, g2, g2)
        dm_c = jnp.einsum("cq,qi,qi->ci", self.W, N2, N2)
        n = self.space.n_unodes
        zero = jnp.zeros((n,), dtype=dk_c.dtype)
        dk = zero.at[self.cell_unodes].add(dk_c)
        dm = zero.at[self.cell_unodes].add(dm_c)
        return dm, dk

    # -- Jacobians -----------------------------------------------------------
    def _element_matrices(self, x, scalars, source_q, picard: bool):
        space = self.space
        u, p = space.split(x)
        u_c = u[self.cell_unodes]
        p_c = p[self.cell_pnodes]
        nn2d = self.nu_loc

        def elem(u_cc, p_cc, Ji, Wc, sq):
            def f(z):
                uu = z[:nn2d].reshape(-1, self.dim)
                pp = z[nn2d:]
                r_u, r_p = self._cell_residual(uu, pp, u_cc, Ji, Wc, sq,
                                               scalars, picard)
                return jnp.concatenate([r_u.reshape(-1), r_p])

            z0 = jnp.concatenate([u_cc.reshape(-1), p_cc])
            return jax.jacfwd(f)(z0)

        in_axes = (0, 0, 0, 0, 0 if np.ndim(source_q) == 3 else None)
        return jax.vmap(elem, in_axes=in_axes)(u_c, p_c, self.Jinv, self.W,
                                               source_q)

    def jacobian_csr(self, x, scalars, source_q=0.0, picard=False):
        fn = self._get_jit(("jac_csr", bool(picard),
                            np.shape(source_q) == ()), lambda:
                           jax.jit(partial(self._jac_csr_impl,
                                           picard=bool(picard))))
        return fn(x, scalars, source_q)

    def _jac_csr_impl(self, x, scalars, source_q, picard):
        elem = self._element_matrices(x, scalars, source_q, picard)
        values = sparse.assemble_csr(self.pattern, elem)
        values = sparse.apply_bc_rows(self.pattern, values,
                                      self._bc_mask_nnz,
                                      self._bc_diag_slots)
        return sparse.CSRMatrix(self.pattern, values)

    def jacobian_dense(self, x, scalars, source_q=0.0, picard=False):
        fn = self._get_jit(("jac_dense", bool(picard),
                            np.shape(source_q) == ()), lambda:
                           jax.jit(partial(self._jac_dense_impl,
                                           picard=bool(picard))))
        return fn(x, scalars, source_q)

    def _jac_dense_impl(self, x, scalars, source_q, picard):
        elem = self._element_matrices(x, scalars, source_q, picard)
        n = self.space.n_dofs
        dense = jnp.zeros((n, n), dtype=elem.dtype)
        rows = self.cell_dofs[:, :, None]
        cols = self.cell_dofs[:, None, :]
        dense = dense.at[rows, cols].add(elem)
        dense = dense.at[self._bc_dofs, :].set(0.0)
        dense = dense.at[self._bc_dofs, self._bc_dofs].set(1.0)
        return dense

    # -- boundary tractions ---------------------------------------------------
    def facet_batch_device(self, batch: dict) -> dict:
        dt = _dtype()
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            if arr.dtype.kind == "f":
                arr = arr.astype(dt)
            out[k] = arr
        out["cell_unodes"] = self.cell_unodes[out["cells"]]
        out["cell_pnodes"] = self.cell_pnodes[out["cells"]]
        return out

    def traction_residual(self, batch_dev: dict, t_q) -> jnp.ndarray:
        """+ integral(traction . w) dA, scattered to (n_unodes, d).

        Sign matches the reference, which *adds* the traction term to the
        residual F (ns_solver_base.py:139-155).
        """
        r_c = jnp.einsum("fq,fqd,fqi->fid", batch_dev["weights"], t_q,
                         batch_dev["N2"])
        return kernels.scatter_unodes(r_c, batch_dev["cell_unodes"],
                                      self.space.n_unodes)

    def boundary_velocity_flux(self, batch_dev: dict, u) -> jnp.ndarray:
        """integral(u . n) over the batch facets (mass flux)."""
        u_q = jnp.einsum("fqi,fid->fqd", batch_dev["N2"],
                         u[batch_dev["cell_unodes"]])
        un = jnp.einsum("fqd,fqd->fq", u_q, batch_dev["normals"])
        return jnp.sum(batch_dev["weights"] * un)

    def boundary_traction_force(self, batch_dev: dict, u, p, visc) -> jnp.ndarray:
        """integral(-p n + visc * (grad u + grad u^T)/2 . n) dA  -> (d,).

        The DFG drag/lift integrand (reference demo/dfg_benchmark.py:54-61).
        """
        g2 = jnp.einsum("fqia,fqae->fqie", batch_dev["G2"], batch_dev["Jinv"])
        grad_u = jnp.einsum("fid,fqie->fqde", u[batch_dev["cell_unodes"]], g2)
        p_q = jnp.einsum("fqj,fj->fq", batch_dev["N1"],
                         p[batch_dev["cell_pnodes"]])
        D = 0.5 * (grad_u + jnp.swapaxes(grad_u, 2, 3))
        n = batch_dev["normals"]                          # (nf, nqf, d)
        tau = (-p_q[:, :, None] * n
               + visc * jnp.einsum("fqde,fqe->fqd", D, n))
        return jnp.einsum("fq,fqd->d", batch_dev["weights"], tau)

    # -- projections / functionals -------------------------------------------
    def project_velocity(self, values_at_unodes=None, values_at_quad=None,
                         tol=1e-14):
        """L2-project onto the P2 velocity space (mass-matrix CG solve).

        Provide either nodal values (used as RHS data via interpolation at
        quadrature points) or direct quadrature-point values (nc, nq, d).
        """
        from navierstokes_tpu.linalg.krylov import cg

        N2 = jnp.asarray(self.space.N2, dtype=_dtype())
        if values_at_quad is None:
            vn = jnp.asarray(values_at_unodes, dtype=_dtype())
            values_at_quad = jnp.einsum("qi,cid->cqd", N2,
                                        vn[self.cell_unodes])
        b_c = jnp.einsum("cq,cqd,qi->cid", self.W, values_at_quad, N2)
        b = kernels.scatter_unodes(b_c, self.cell_unodes, self.space.n_unodes)

        def mass(uflat):
            return kernels.p2_vector_mass_apply(
                N2, self.W, self.cell_unodes, uflat.reshape(-1, self.dim),
                self.space.n_unodes).reshape(-1)

        x, _ = cg(mass, b.reshape(-1), tol=tol)
        return x.reshape(-1, self.dim)

    def project_pressure(self, values_at_pnodes=None, values_at_quad=None,
                         tol=1e-14):
        from navierstokes_tpu.linalg.krylov import cg

        N1 = jnp.asarray(self.space.N1, dtype=_dtype())
        if values_at_quad is None:
            vn = jnp.asarray(values_at_pnodes, dtype=_dtype())
            values_at_quad = jnp.einsum("qj,cj->cq", N1, vn[self.cell_pnodes])
        b_c = jnp.einsum("cq,cq,qj->cj", self.W, values_at_quad, N1)
        b = kernels.scatter_pnodes(b_c, self.cell_pnodes, self.space.n_pnodes)

        def mass(p):
            p_q = jnp.einsum("qj,cj->cq", N1, p[self.cell_pnodes])
            r_c = jnp.einsum("cq,cq,qj->cj", self.W, p_q, N1)
            return kernels.scatter_pnodes(r_c, self.cell_pnodes,
                                          self.space.n_pnodes)

        x, _ = cg(mass, b, tol=tol)
        return x

    def domain_volume(self) -> float:
        return float(jnp.sum(self.W))

    def mean_pressure(self, p):
        return jnp.sum(self.W * self.p_at_quad(p)) / jnp.sum(self.W)

    def l2_error_velocity(self, u, exact_fn, t=None) -> float:
        xq = np.asarray(self.space.quad_coords())
        from navierstokes_tpu.fem.spaces import _eval_field
        exact = _eval_field(exact_fn, xq.reshape(-1, self.dim), t, self.dim)
        exact = jnp.asarray(exact.reshape(xq.shape), dtype=_dtype())
        diff = self.u_at_quad(u) - exact
        return float(jnp.sqrt(jnp.sum(self.W * jnp.sum(diff ** 2, axis=-1))))

    def l2_error_pressure(self, p, exact_fn, t=None) -> float:
        xq = np.asarray(self.space.quad_coords())
        from navierstokes_tpu.fem.spaces import _eval_field
        exact = _eval_field(exact_fn, xq.reshape(-1, self.dim), t, None)
        exact = jnp.asarray(exact.reshape(xq.shape[:2]), dtype=_dtype())
        diff = self.p_at_quad(p) - exact
        return float(jnp.sqrt(jnp.sum(self.W * diff ** 2)))

    def divergence_l2(self, u) -> float:
        g = self.grad_u_at_quad(u)
        div = jnp.trace(g, axis1=2, axis2=3)
        return float(jnp.sqrt(jnp.sum(self.W * div ** 2)))

    def velocity_operator_image(self, u, scalars, source_q=0.0):
        """Velocity-block image of the momentum operator at ``u``.

        Returns the un-masked assembled velocity residual (n_unodes, dim)
        of the convective+viscous(+Coriolis) terms with the given
        coefficients, zero pressure and zero acceleration -- the
        explicit-side building block of theta/IMEX splittings.
        """
        space = self.space
        p0 = jnp.zeros(space.n_pnodes, dtype=u.dtype)
        full = dict(scalars)
        full.setdefault("cp", 0.0)
        full.setdefault("accel0", 0.0)
        u_c = u[self.cell_unodes]
        p_c = p0[self.cell_pnodes]

        def one(u_cc, p_cc, Ji, Wc, sq):
            r_u, _ = self._cell_residual(u_cc, p_cc, u_cc, Ji, Wc, sq,
                                         full, False)
            return r_u

        in_axes = (0, 0, 0, 0, 0 if np.ndim(source_q) == 3 else None)
        r_u_c = jax.vmap(one, in_axes=in_axes)(u_c, p_c, self.Jinv,
                                               self.W, source_q)
        return kernels.scatter_unodes(r_u_c, self.cell_unodes,
                                      space.n_unodes)


class VelocityOperator:
    """Residual/Jacobian on the collapsed P2 velocity subspace.

    Used by the IPCS diffusion step (reference: ns_ipcs_solver.py:106-147):
    unknown is the intermediate velocity; the lagged pressure and BDF
    history enter as precomputed data.
    """

    def __init__(self, space: TaylorHoodSpace, form_convective_term="standard",
                 form_viscous_term="reduced"):
        config.ensure_accurate_matmuls()
        self.space = space
        self.dim = space.dim
        self.conv_form = parse_convective_form(form_convective_term)
        self.visc_form = parse_viscous_form(form_viscous_term)

        dt = _dtype()
        self.Jinv = jnp.asarray(space.Jinv_q, dtype=dt)
        self.W = jnp.asarray(space.integration_weights(), dtype=dt)
        self.cell_unodes = jnp.asarray(space.cell_unodes)
        self.cell_pnodes = jnp.asarray(space.cell_pnodes)

        d = space.dim
        udofs = (space.cell_unodes[:, :, None] * d
                 + np.arange(d)[None, None, :])
        self.cell_dofs_np = udofs.reshape(len(udofs), -1).astype(np.int64)
        self.cell_dofs = jnp.asarray(self.cell_dofs_np)
        self.n_dofs = space.n_unodes * d
        self.pattern = sparse.build_pattern(self.cell_dofs_np, self.n_dofs)

        self._cell_residual = kernels.make_velocity_cell_residual(
            space.N2, space.G2, space.N1, d, self.conv_form, self.visc_form)
        self._bc_dofs = jnp.zeros((0,), dtype=jnp.int32)
        self._jit_cache = {}

    def set_bc_dofs(self, bc_dofs: np.ndarray) -> None:
        self._bc_dofs_np = np.asarray(bc_dofs, dtype=np.int32)
        self._bc_dofs = jnp.asarray(self._bc_dofs_np)
        mask, diag = sparse.bc_row_masks(self.pattern, self._bc_dofs_np)
        self._bc_mask_nnz = jnp.asarray(mask)
        self._bc_diag_slots = jnp.asarray(diag)
        self._jit_cache.clear()

    def _get_jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def residual(self, uflat, bc_values, scalars, p_old, source_q=0.0):
        fn = self._get_jit(("residual", np.shape(source_q) == ()),
                           lambda: jax.jit(self._residual_impl))
        return fn(uflat, bc_values, scalars, p_old, source_q)

    def _residual_impl(self, uflat, bc_values, scalars, p_old, source_q):
        space = self.space
        u = uflat.reshape(-1, self.dim)
        u_c = u[self.cell_unodes]
        p_c = p_old[self.cell_pnodes]

        def one(u_cc, Ji, Wc, sq, p_cc):
            return self._cell_residual(u_cc, u_cc, Ji, Wc, sq, p_cc,
                                       scalars, False)

        in_axes = (0, 0, 0, 0 if np.ndim(source_q) == 3 else None, 0)
        r_u_c = jax.vmap(one, in_axes=in_axes)(u_c, self.Jinv, self.W,
                                               source_q, p_c)
        r = kernels.scatter_unodes(r_u_c, self.cell_unodes,
                                   space.n_unodes).reshape(-1)
        return r.at[self._bc_dofs].set(uflat[self._bc_dofs] - bc_values)

    def jacobian_csr(self, uflat, scalars, p_old, source_q=0.0,
                     picard=False):
        fn = self._get_jit(("jac", bool(picard), np.shape(source_q) == ()),
                           lambda: jax.jit(partial(self._jac_impl,
                                                   picard=bool(picard))))
        return fn(uflat, scalars, p_old, source_q)

    def _jac_impl(self, uflat, scalars, p_old, source_q, picard):
        u = uflat.reshape(-1, self.dim)
        u_c = u[self.cell_unodes]
        p_c = p_old[self.cell_pnodes]

        def elem(u_cc, Ji, Wc, sq, p_cc):
            def f(z):
                uu = z.reshape(-1, self.dim)
                return self._cell_residual(uu, u_cc, Ji, Wc, sq, p_cc,
                                           scalars, picard).reshape(-1)
            return jax.jacfwd(f)(u_cc.reshape(-1))

        in_axes = (0, 0, 0, 0 if np.ndim(source_q) == 3 else None, 0)
        elem_mats = jax.vmap(elem, in_axes=in_axes)(u_c, self.Jinv, self.W,
                                                    source_q, p_c)
        values = sparse.assemble_csr(self.pattern, elem_mats)
        values = sparse.apply_bc_rows(self.pattern, values,
                                      self._bc_mask_nnz, self._bc_diag_slots)
        return sparse.CSRMatrix(self.pattern, values)

    def mass_matvec(self, uflat):
        N2 = jnp.asarray(self.space.N2, dtype=_dtype())
        return kernels.p2_vector_mass_apply(
            N2, self.W, self.cell_unodes, uflat.reshape(-1, self.dim),
            self.space.n_unodes).reshape(-1)

    def mass_rhs(self, values_at_quad):
        """b_i = integral(values . N_i): RHS of an L2 projection."""
        N2 = jnp.asarray(self.space.N2, dtype=_dtype())
        b_c = jnp.einsum("cq,cqd,qi->cid", self.W, values_at_quad, N2)
        return kernels.scatter_unodes(b_c, self.cell_unodes,
                                      self.space.n_unodes).reshape(-1)


class PressurePoissonOperator:
    """P1 scalar Laplacian + mass on the pressure dofmap (SPD, matrix-free).

    The IPCS projection step (reference: ns_ipcs_solver.py:149-171) and the
    stream-potential postprocessing solve both use this.
    """

    def __init__(self, space: TaylorHoodSpace):
        config.ensure_accurate_matmuls()
        self.space = space
        self.dim = space.dim
        dt = _dtype()
        self.Jinv = jnp.asarray(space.Jinv_q, dtype=dt)
        self.W = jnp.asarray(space.integration_weights(), dtype=dt)
        self.cell_pnodes = jnp.asarray(space.cell_pnodes)
        self.n_dofs = space.n_pnodes
        self.G1 = jnp.asarray(space.G1, dtype=dt)
        self.N1 = jnp.asarray(space.N1, dtype=dt)
        self._g1 = jnp.einsum("qja,cqae->cqje", self.G1, self.Jinv)

    def stiffness_matvec(self, p):
        grad_p = jnp.einsum("cj,cqje->cqe", p[self.cell_pnodes], self._g1)
        r_c = jnp.einsum("cq,cqe,cqje->cj", self.W, grad_p, self._g1)
        return kernels.scatter_pnodes(r_c, self.cell_pnodes, self.n_dofs)

    def mass_matvec(self, p):
        p_q = jnp.einsum("qj,cj->cq", self.N1, p[self.cell_pnodes])
        r_c = jnp.einsum("cq,cq,qj->cj", self.W, p_q, self.N1)
        return kernels.scatter_pnodes(r_c, self.cell_pnodes, self.n_dofs)

    def rhs_grad_dot_gradq(self, grad_at_quad):
        """b_j = integral(grad_at_quad . grad(N_j))."""
        r_c = jnp.einsum("cq,cqe,cqje->cj", self.W, grad_at_quad, self._g1)
        return kernels.scatter_pnodes(r_c, self.cell_pnodes, self.n_dofs)

    def rhs_scalar(self, vals_at_quad):
        """b_j = integral(vals * N_j)."""
        r_c = jnp.einsum("cq,cq,qj->cj", self.W, vals_at_quad, self.N1)
        return kernels.scatter_pnodes(r_c, self.cell_pnodes, self.n_dofs)

    def convection_matvec(self, p, u_q):
        """N_p(u) p = integral((u . grad p) q): pressure-space convection
        (the PCD preconditioner's transport operator)."""
        grad_p = jnp.einsum("cj,cqje->cqe", p[self.cell_pnodes], self._g1)
        conv = jnp.einsum("cqe,cqe->cq", u_q, grad_p)
        r_c = jnp.einsum("cq,cq,qj->cj", self.W, conv, self.N1)
        return kernels.scatter_pnodes(r_c, self.cell_pnodes, self.n_dofs)
