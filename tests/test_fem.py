"""FEM-core unit tests: quadrature, elements, dofmaps, periodic merging,
facet batches, projections.

Covers the role of the reference's tests/test_function_assigner.py (mixed
split/join round-trips) plus exactness checks the reference gets "for free"
from dolfin.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from navierstokes_tpu.assembly.operators import MixedOperator
from navierstokes_tpu.fem import elements
from navierstokes_tpu.fem.spaces import TaylorHoodSpace, axis_periodic
from navierstokes_tpu.mesh import hyper_cube, hyper_rectangle


def test_triangle_quadrature_polynomial_exactness():
    for degree in (1, 2, 4, 6):
        pts, wts = elements.triangle_quadrature(degree)
        assert np.isclose(wts.sum(), 0.5)
        # integrate x^a y^b exactly: integral over ref triangle =
        # a! b! / (a+b+2)!
        import math
        for a in range(degree + 1):
            for b in range(degree + 1 - a):
                exact = (math.factorial(a) * math.factorial(b)
                         / math.factorial(a + b + 2))
                approx = np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b)
                assert abs(approx - exact) < 1e-14, (degree, a, b)


def test_tet_quadrature_polynomial_exactness():
    import math
    pts, wts = elements.tetrahedron_quadrature(4)
    assert np.isclose(wts.sum(), 1.0 / 6.0)
    for a in range(3):
        for b in range(3 - a):
            exact = (math.factorial(a) * math.factorial(b)
                     / math.factorial(a + b + 3))
            approx = np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b)
            assert abs(approx - exact) < 1e-14


def test_p2_partition_of_unity_and_delta():
    for dim in (2, 3):
        nodes = elements.reference_nodes(2, dim)
        N, dN = elements.tabulate(2, nodes, dim)
        assert np.allclose(N, np.eye(len(nodes)), atol=1e-14)
        pts, _ = elements.simplex_quadrature(dim, 4)
        N, dN = elements.tabulate(2, pts, dim)
        assert np.allclose(N.sum(axis=1), 1.0, atol=1e-14)
        assert np.allclose(dN.sum(axis=1), 0.0, atol=1e-13)


def test_taylor_hood_dof_counts():
    mesh, _ = hyper_cube(2, 4)
    space = TaylorHoodSpace(mesh)
    nv, ne = mesh.n_vertices, mesh.n_edges
    assert space.n_unodes == nv + ne
    assert space.n_pnodes == nv
    assert space.n_dofs == 2 * (nv + ne) + nv


def test_periodic_merging_counts():
    mesh, _ = hyper_cube(2, 4)
    space = TaylorHoodSpace(mesh, periodic=[axis_periodic(0)])
    # one column of vertices (5) and boundary edge midpoints (4) merge away
    nv, ne = mesh.n_vertices, mesh.n_edges
    assert space.n_pnodes == nv - 5
    assert space.n_unodes == nv + ne - 9

    space2 = TaylorHoodSpace(mesh, periodic=[axis_periodic(0),
                                             axis_periodic(1)])
    # doubly periodic: pressure nodes = 16 interior grid points
    assert space2.n_pnodes == 16


def test_mixed_split_join_roundtrip():
    mesh, _ = hyper_cube(2, 3)
    space = TaylorHoodSpace(mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(space.n_dofs))
    u, p = space.split(x)
    assert np.allclose(space.join(u, p), x)


def test_interpolation_exact_for_quadratics():
    mesh, _ = hyper_cube(2, 3)
    space = TaylorHoodSpace(mesh)
    f = lambda x: np.stack([x[:, 0] ** 2 + 2 * x[:, 1],
                            x[:, 0] * x[:, 1]], axis=1)
    u = space.interpolate_velocity(f)
    op = MixedOperator(space)
    assert op.l2_error_velocity(jnp.asarray(u), f) < 1e-13


def test_projection_matches_interpolation_for_quadratics():
    mesh, _ = hyper_cube(2, 3)
    space = TaylorHoodSpace(mesh)
    op = MixedOperator(space)
    f = lambda x: np.stack([x[:, 1] * (1 - x[:, 1]), 0.0 * x[:, 0]], axis=1)
    u_i = space.interpolate_velocity(f)
    u_p = op.project_velocity(values_at_unodes=u_i)
    assert np.abs(np.asarray(u_p) - u_i).max() < 1e-11


def test_facet_batch_measures_and_coords():
    mesh, markers = hyper_rectangle((0.0, 0.0), (2.0, 1.0), (4, 2))
    from navierstokes_tpu.mesh import HyperRectangleBoundaryMarkers as M

    space = TaylorHoodSpace(mesh)
    ids = markers.ids_with_value(M.right.value)
    batch = space.facet_batch(ids)
    # total measure of the right face = 1.0
    assert np.isclose(batch["weights"].sum(), 1.0)
    assert np.allclose(batch["x"][..., 0], 2.0)
    assert np.allclose(batch["normals"], [1.0, 0.0])
    # trace evaluation: P2 shape functions on the facet sum to 1
    assert np.allclose(batch["N2"].sum(axis=2), 1.0)


def test_boundary_flux_functional():
    mesh, markers = hyper_cube(2, 4)
    from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M

    space = TaylorHoodSpace(mesh)
    op = MixedOperator(space)
    u = jnp.asarray(space.interpolate_velocity(
        lambda x: np.stack([x[:, 0], -x[:, 1]], axis=1)))
    batch = op.facet_batch_device(
        space.facet_batch(markers.ids_with_value(M.right.value)))
    # u.n on x=1 face: u_x = 1 -> flux = 1
    assert np.isclose(float(op.boundary_velocity_flux(batch, u)), 1.0)


def test_divergence_functional():
    mesh, _ = hyper_cube(2, 4)
    space = TaylorHoodSpace(mesh)
    op = MixedOperator(space)
    u = jnp.asarray(space.interpolate_velocity(
        lambda x: np.stack([x[:, 0], -x[:, 1]], axis=1)))
    assert op.divergence_l2(u) < 1e-13
    u2 = jnp.asarray(space.interpolate_velocity(
        lambda x: np.stack([x[:, 0], x[:, 1]], axis=1)))
    assert np.isclose(op.divergence_l2(u2), 2.0)  # div=2 on unit square


def test_isoparametric_shell_snapping():
    """Curved-boundary (isoparametric) shells in 2D AND 3D: P2 mid-edge
    nodes of both boundary spheres snap onto the true surface, driving
    the quadrature volume 2-3 orders of magnitude closer to the analytic
    shell volume than the straight-edged mesh (reference gets curved
    boundaries from mshr CSG, grid_generator.py:67-108)."""
    import numpy as np

    from navierstokes_tpu.fem.spaces import TaylorHoodSpace
    from navierstokes_tpu.mesh import spherical_shell

    for dim, npt, exact in ((2, 16, np.pi * 0.75),
                            (3, 8, 4.0 / 3.0 * np.pi * 0.875)):
        mesh, _ = spherical_shell(dim, (0.5, 1.0), npt)
        err_straight = abs(mesh.cell_volumes.sum() - exact) / exact
        space = TaylorHoodSpace(mesh)   # snap picked up from mesh.snap
        vol = float(np.asarray(space.integration_weights()).sum())
        err_iso = abs(vol - exact) / exact
        assert err_iso < 1e-2 * err_straight, (dim, err_straight, err_iso)
