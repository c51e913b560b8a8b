"""Class-grid view of a Taylor-Hood space on a structured rectangle mesh.

On the uniform right-diagonal triangulation produced by
``mesh.generators.hyper_rectangle`` (reference: grid_generator.py:154-208)
the P2/P1 nodes fall into translation-invariant *classes* on the cell
lattice:

  * velocity (P2): 4 classes -- vertices, x-edge midpoints, y-edge
    midpoints, diagonal midpoints -- each an (nx, ny) grid (periodic case);
  * pressure (P1): 1 class (the vertices).

Every FEM operator with constant coefficients is then block-circulant over
the cell lattice: operator application is a fixed *stencil* (a handful of
``jnp.roll`` shifts and fused multiply-adds -- pure VPU work, no gathers),
and, for doubly periodic meshes, the operator is exactly block-diagonalized
by the 2D DFT (4x4 complex blocks per Fourier mode), so the linear solves of
the projection scheme become exact direct solves at FFT cost.

This is the TPU-native fast path replacing the gather-bound unstructured
element loop (parallel/sharded.py) on structured meshes; the two are
verified equivalent in tests/test_structured.py.
"""

from __future__ import annotations

import numpy as np

_DEC = 9  # coordinate comparison decimals


class NotStructured(ValueError):
    """The space is not a structured class-grid candidate."""


# class parity offsets on the fine (half-spacing) lattice:
# 0 vertex (0,0), 1 x-edge (1,0), 2 y-edge (0,1), 3 diagonal (1,1)
_CLASS_PARITY = np.array([[0, 0], [1, 0], [0, 1], [1, 1]])
N_UCLASS = 4


class PeriodicStructuredTH:
    """Doubly-periodic structured Taylor-Hood space as class grids.

    Builds (host-side, once):
      * ``u_rank[c, i, j]`` / ``p_rank[i, j]``: node rank of class ``c`` at
        cell position (i, j) -- the bijection between flat dof vectors and
        class-grid tensors;
      * per-triangle local-node tables ``u_shift[tau, l] -> (class, si, sj)``
        and ``p_shift[tau, l] -> (si, sj)`` (cell-lattice shifts);
      * per-triangle element matrices M/K/G/L (uniform geometry).
    """

    def __init__(self, space):
        self.space = space
        mesh = space.mesh
        if mesh.dim != 2:
            raise NotStructured("only 2D structured grids supported")
        if not space.periodic:
            raise NotStructured("space is not periodic")

        uc = space.u_coords
        # fine lattice spacing from the distinct master x/y coordinates
        xs = np.unique(np.round(uc[:, 0], _DEC))
        ys = np.unique(np.round(uc[:, 1], _DEC))
        hx2, hy2 = np.diff(xs), np.diff(ys)
        if len(xs) < 2 or len(ys) < 2 \
                or not np.allclose(hx2, hx2[0], rtol=1e-6) \
                or not np.allclose(hy2, hy2[0], rtol=1e-6):
            raise NotStructured("points are not on a uniform lattice")
        self.hx, self.hy = 2.0 * hx2[0], 2.0 * hy2[0]
        nx, ny = len(xs) // 2, len(ys) // 2
        if len(xs) != 2 * nx or len(ys) != 2 * ny \
                or space.n_unodes != N_UCLASS * nx * ny \
                or space.n_pnodes != nx * ny:
            raise NotStructured("node counts do not match a doubly periodic "
                                "structured mesh")
        self.nx, self.ny = nx, ny
        self.origin = np.array([xs[0], ys[0]])

        fine_u = self._fine_indices(uc)                   # (n_unodes, 2)
        cls = (fine_u[:, 0] % 2) + 2 * (fine_u[:, 1] % 2)  # parity -> class
        gi, gj = fine_u[:, 0] // 2, fine_u[:, 1] // 2
        self.u_rank = np.full((N_UCLASS, nx, ny), -1, dtype=np.int32)
        self.u_rank[cls, gi, gj] = np.arange(space.n_unodes, dtype=np.int32)
        if (self.u_rank < 0).any():
            raise NotStructured("velocity nodes do not tile the class grids")

        fine_p = self._fine_indices(space.p_coords)
        if (fine_p % 2).any():
            raise NotStructured("pressure nodes off the vertex lattice")
        self.p_rank = np.full((nx, ny), -1, dtype=np.int32)
        self.p_rank[fine_p[:, 0] // 2, fine_p[:, 1] // 2] = \
            np.arange(space.n_pnodes, dtype=np.int32)
        if (self.p_rank < 0).any():
            raise NotStructured("pressure nodes do not tile the grid")

        self._build_cell_tables(fine_u, fine_p)
        self._build_element_matrices()

    # -- host-side construction ----------------------------------------------
    def _fine_indices(self, coords):
        f = (coords - self.origin) / np.array([self.hx / 2, self.hy / 2])
        fi = np.round(f).astype(np.int64)
        if not np.allclose(f, fi, atol=1e-6):
            raise NotStructured("node off the fine lattice")
        return fi % np.array([2 * self.nx, 2 * self.ny])

    def _build_cell_tables(self, fine_u, fine_p):
        """Group cells into the two congruent triangle types and extract the
        translation-invariant local-node shift tables."""
        space, nx, ny = self.space, self.nx, self.ny
        n2 = 2 * np.array([nx, ny])
        fu = fine_u[space.cell_unodes]                   # (nc, 6, 2)
        fp = fine_p[space.cell_pnodes]                   # (nc, 3, 2)

        # cell anchor: the diagonal-midpoint node sits at fine (2i+1, 2j+1)
        # of cell (i, j) for BOTH triangle types
        is_diag = (fu[:, :, 0] % 2 == 1) & (fu[:, :, 1] % 2 == 1)
        if not (is_diag.sum(axis=1) == 1).all():
            raise NotStructured("cells lack a unique diagonal midpoint")
        diag = fu[is_diag]                                # (nc, 2)
        base = (diag - 1) % n2                            # fine coords of v00

        offu = (fu - base[:, None, :]) % n2               # in {0, 1, 2}
        offp = (fp - base[:, None, :]) % n2
        if offu.max() > 2 or offp.max() > 2:
            raise NotStructured("cell touches non-adjacent lattice sites")

        # signature -> triangle type
        sig = np.concatenate([offu.reshape(len(offu), -1),
                              offp.reshape(len(offp), -1)], axis=1)
        uniq, tau = np.unique(sig, axis=0, return_inverse=True)
        if len(uniq) != 2:
            raise NotStructured(f"{len(uniq)} cell congruence classes "
                                "(expected 2)")
        self.cell_tau = tau.astype(np.int32)
        self.cell_base = (base // 2).astype(np.int32)     # cell lattice (i,j)

        # local-node tables per tau: class + cell-lattice shift
        def u_table(off):                                 # (6, 2) fine offset
            cls = (off[:, 0] % 2) + 2 * (off[:, 1] % 2)
            par = _CLASS_PARITY[cls]
            shift = (off - par) // 2
            return cls.astype(np.int32), shift.astype(np.int32)

        rep = [np.nonzero(tau == t)[0][0] for t in range(2)]
        self.u_class = np.stack([u_table(offu[r])[0] for r in rep])  # (2,6)
        self.u_shift = np.stack([u_table(offu[r])[1] for r in rep])  # (2,6,2)
        self.p_shift = np.stack([(offp[r] // 2).astype(np.int32)
                                 for r in rep])                      # (2,3,2)

    def _build_element_matrices(self):
        """Per-triangle-type element matrices (uniform geometry)."""
        space = self.space
        rep = [np.nonzero(self.cell_tau == t)[0][0] for t in range(2)]
        W = space.integration_weights()
        for t, r in enumerate(rep):
            same = np.nonzero(self.cell_tau == t)[0]
            if not np.allclose(space.Jinv[same], space.Jinv[r], atol=1e-9):
                raise NotStructured("non-uniform cell geometry")

        Wt = W[rep]                                       # (2, nq)
        Jinv = space.Jinv[rep]                            # (2, 2, 2)
        g2 = np.einsum("qia,tae->tqie", space.G2, Jinv)
        g1 = np.einsum("qja,tae->tqje", space.G1, Jinv)
        self.W_tau = Wt
        self.Jinv_tau = Jinv
        self.M_tau = np.einsum("tq,qi,qj->tij", Wt, space.N2, space.N2)
        self.K_tau = np.einsum("tq,tqie,tqje->tij", Wt, g2, g2)
        # G[t, i, d, j] = -int N1_j dN2_i/dx_d  (as parallel/sharded.py G_c)
        self.G_tau = -np.einsum("tq,qj,tqid->tidj", Wt, space.N1, g2)
        self.L_tau = np.einsum("tq,tqje,tqke->tjk", Wt, g1, g1)

    # -- stencil (tap) extraction -------------------------------------------
    def taps_uu(self, A_tau):
        """Assembled stencil of a P2->P2 operator given (2, 6, 6) element
        matrices: dict (c_out, c_in) -> list of ((si, sj), weight)."""
        taps = {}
        for t in range(2):
            for lo in range(6):
                co = self.u_class[t, lo]
                for li in range(6):
                    ci = self.u_class[t, li]
                    s = tuple(self.u_shift[t, li] - self.u_shift[t, lo])
                    key = (int(co), int(ci))
                    taps.setdefault(key, {})
                    taps[key][s] = taps[key].get(s, 0.0) + A_tau[t, lo, li]
        return _prune(taps)

    def taps_up(self, A_tau):
        """P1 -> P2 coupling taps from (2, 6, ..., 3) element tensors (the
        trailing axes between local indices are carried through -- e.g. the
        gradient's direction axis)."""
        taps = {}
        for t in range(2):
            for lo in range(6):
                co = self.u_class[t, lo]
                for li in range(3):
                    s = tuple(self.p_shift[t, li] - self.u_shift[t, lo])
                    key = (int(co), 0)
                    taps.setdefault(key, {})
                    w = A_tau[t, lo, ..., li]
                    taps[key][s] = taps[key].get(s, 0.0) + w
        return _prune(taps)

    def taps_pu(self, A_tau):
        """P2 -> P1 taps from (2, 6, ..., 3) tensors read transposed."""
        taps = {}
        for t in range(2):
            for lo in range(3):
                for li in range(6):
                    ci = self.u_class[t, li]
                    s = tuple(self.u_shift[t, li] - self.p_shift[t, lo])
                    key = (0, int(ci))
                    taps.setdefault(key, {})
                    w = A_tau[t, li, ..., lo]
                    taps[key][s] = taps[key].get(s, 0.0) + w
        return _prune(taps)

    def taps_pp(self, A_tau):
        """P1 -> P1 taps from (2, 3, 3) element matrices."""
        taps = {}
        for t in range(2):
            for lo in range(3):
                for li in range(3):
                    s = tuple(self.p_shift[t, li] - self.p_shift[t, lo])
                    key = (0, 0)
                    taps.setdefault(key, {})
                    taps[key][s] = taps[key].get(s, 0.0) + A_tau[t, lo, li]
        return _prune(taps)

    # -- flat <-> grid transforms -------------------------------------------
    def u_to_grids(self, u_flat):
        """(n_unodes*d,) -> (4, nx, ny, d) class grids (host or device)."""
        d = self.space.dim
        u = u_flat.reshape(self.space.n_unodes, d)
        return u[self.u_rank]

    def grids_to_u(self, U):
        d = self.space.dim
        if isinstance(U, np.ndarray):
            out = np.empty((self.space.n_unodes, d), dtype=U.dtype)
            out[self.u_rank] = U
            return out.reshape(-1)
        import jax.numpy as jnp

        out = jnp.zeros((self.space.n_unodes, d), dtype=U.dtype)
        return out.at[self.u_rank].set(U).reshape(-1)

    def p_to_grid(self, p_flat):
        return p_flat[self.p_rank]

    def grid_to_p(self, P):
        if isinstance(P, np.ndarray):
            out = np.empty(self.space.n_pnodes, dtype=P.dtype)
            out[self.p_rank] = P
            return out
        import jax.numpy as jnp

        out = jnp.zeros(self.space.n_pnodes, dtype=P.dtype)
        return out.at[self.p_rank].set(P)


def _prune(taps, tol=1e-14):
    """Drop numerically-zero taps; convert to {key: [(shift, w), ...]}."""
    out = {}
    for key, entries in taps.items():
        kept = [(s, w) for s, w in entries.items()
                if np.max(np.abs(w)) > tol]
        if kept:
            out[key] = kept
    return out
