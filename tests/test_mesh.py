"""Mesh-layer tests: generators, topology, markers, boundary normals.

Covers the reference's tests/test_grid_generator.py and
tests/test_auxiliary_methods.py (exact unit normals on cube faces), without
the network-dependent .geo download.
"""

import numpy as np
import pytest

from navierstokes_tpu.mesh import (
    HyperCubeBoundaryMarkers,
    SphericalAnnulusBoundaryMarkers,
    SimplexMesh,
    backward_facing_step,
    blasius_plate,
    boundary_normal,
    channel_with_cylinder,
    extract_all_boundary_markers,
    hyper_cube,
    hyper_rectangle,
    open_hyper_cube,
    spherical_shell,
)

M = HyperCubeBoundaryMarkers


def test_hyper_cube_2d():
    mesh, markers = hyper_cube(2, 8)
    assert mesh.n_vertices == 81
    assert mesh.n_cells == 128
    assert np.all(mesh.cell_volumes > 0)
    assert np.isclose(mesh.cell_volumes.sum(), 1.0)
    found = extract_all_boundary_markers(mesh, markers)
    assert found == {M.left.value, M.right.value, M.bottom.value, M.top.value}
    # each side has 8 boundary facets
    for v in (M.left, M.right, M.bottom, M.top):
        assert len(markers.ids_with_value(v.value)) == 8


def test_hyper_cube_3d():
    mesh, markers = hyper_cube(3, 4)
    assert mesh.dim == 3
    assert mesh.n_cells == 6 * 4 ** 3
    assert np.isclose(mesh.cell_volumes.sum(), 1.0)
    found = extract_all_boundary_markers(mesh, markers)
    assert found == {M.left.value, M.right.value, M.bottom.value,
                     M.top.value, M.back.value, M.front.value}


def test_boundary_normals_2d():
    mesh, markers = hyper_cube(2, 5)
    assert boundary_normal(mesh, markers, M.left.value) == (-1.0, 0.0)
    assert boundary_normal(mesh, markers, M.right.value) == (1.0, 0.0)
    assert boundary_normal(mesh, markers, M.bottom.value) == (0.0, -1.0)
    assert boundary_normal(mesh, markers, M.top.value) == (0.0, 1.0)


def test_boundary_normals_3d():
    mesh, markers = hyper_cube(3, 3)
    assert boundary_normal(mesh, markers, M.back.value) == (0.0, 0.0, -1.0)
    assert boundary_normal(mesh, markers, M.front.value) == (0.0, 0.0, 1.0)


def test_boundary_normal_rejects_curved():
    mesh, markers = spherical_shell(2, (0.25, 1.0), 20)
    with pytest.raises(ValueError):
        boundary_normal(
            mesh, markers,
            SphericalAnnulusBoundaryMarkers.exterior_boundary.value)


def test_hyper_rectangle():
    mesh, markers = hyper_rectangle((0.0, 0.0), (10.0, 1.0), (50, 5))
    assert np.isclose(mesh.cell_volumes.sum(), 10.0)
    assert boundary_normal(mesh, markers, M.right.value) == (1.0, 0.0)
    xs = mesh.points[:, 0]
    assert xs.min() == 0.0 and xs.max() == 10.0


def test_open_hyper_cube():
    openings = (("bottom", (0.2, 0.0), 0.1),
                ("left", (0.0, 0.5), 0.1),
                ("right", (1.0, 0.7), 0.1),
                ("top", (0.5, 1.0), 0.8))
    mesh, markers = open_hyper_cube(2, 20, openings)
    opening_ids = markers.ids_with_value(M.opening.value)
    assert len(opening_ids) > 0
    mids = mesh.facet_midpoints(opening_ids)
    # every opening facet midpoint lies in one of the declared windows
    in_any = ((np.abs(mids[:, 1]) < 1e-9)
              & (np.abs(mids[:, 0] - 0.2) <= 0.05 + 1e-9))
    in_any |= ((np.abs(mids[:, 0]) < 1e-9)
               & (np.abs(mids[:, 1] - 0.5) <= 0.05 + 1e-9))
    in_any |= ((np.abs(mids[:, 0] - 1.0) < 1e-9)
               & (np.abs(mids[:, 1] - 0.7) <= 0.05 + 1e-9))
    in_any |= ((np.abs(mids[:, 1] - 1.0) < 1e-9)
               & (np.abs(mids[:, 0] - 0.5) <= 0.4 + 1e-9))
    assert np.all(in_any)
    # the top opening with width 0.8 on a 20-mesh covers 16 facets
    top_open = (np.abs(mids[:, 1] - 1.0) < 1e-9).sum()
    assert top_open == 16


def test_spherical_shell():
    ri, ro = 0.25, 1.0
    mesh, markers = spherical_shell(2, (ri, ro), 40)
    area = mesh.cell_volumes.sum()
    assert abs(area - np.pi * (ro ** 2 - ri ** 2)) / area < 2e-2
    inner = markers.ids_with_value(
        SphericalAnnulusBoundaryMarkers.interior_boundary.value)
    outer = markers.ids_with_value(
        SphericalAnnulusBoundaryMarkers.exterior_boundary.value)
    assert len(inner) > 0 and len(outer) > 0
    r_in = np.linalg.norm(mesh.facet_midpoints(inner), axis=1)
    assert np.all(np.abs(r_in - ri) < 0.05 * ri)


def test_facet_normals_consistency():
    mesh, _ = hyper_cube(2, 4)
    ext = mesh.exterior_facet_ids
    normals = mesh.facet_outward_normals(ext)
    mids = mesh.facet_midpoints(ext)
    # outward normals on the unit square point away from the center
    outward = np.einsum("fd,fd->f", normals, mids - 0.5)
    assert np.all(outward > 0)


def test_channel_with_cylinder():
    mesh, markers, marker_map = channel_with_cylinder(resolution=0.5)
    assert set(marker_map) == {"inlet", "outlet", "upper wall",
                               "lower wall", "cylinder"}
    # area = channel minus cylinder (boundary is a polygon: small deficit)
    area = mesh.cell_volumes.sum()
    expected = 22.0 * 4.1 - np.pi * 0.25
    assert abs(area - expected) / expected < 5e-3
    cyl = markers.ids_with_value(marker_map["cylinder"])
    assert len(cyl) >= 16
    mids = mesh.facet_midpoints(cyl)
    r = np.hypot(mids[:, 0] - 2.0, mids[:, 1] - 2.0)
    assert np.all(np.abs(r - 0.5) < 0.05)
    # mesh quality: no sliver cells
    q = mesh.cell_volumes / mesh.cell_diameters ** 2
    assert q.min() > 0.01


def test_backward_facing_step():
    mesh, markers, marker_map = backward_facing_step(resolution=0.5)
    assert np.isclose(mesh.cell_volumes.sum(), 2.0 * 0.5 + 10.0 * 1.0)
    inlet = markers.ids_with_value(marker_map["inlet"])
    mids = mesh.facet_midpoints(inlet)
    assert np.all(mids[:, 1] >= 0.5)


def test_blasius_plate():
    mesh, markers, marker_map = blasius_plate(resolution=0.5)
    plate = markers.ids_with_value(marker_map["plate"])
    assert len(plate) > 0
    assert not np.any(mesh.exterior_facet_mask[plate])
    mids = mesh.facet_midpoints(plate)
    assert np.all(np.abs(mids[:, 1] - 0.5) < 1e-9)
    assert np.all((mids[:, 0] > -1e-9) & (mids[:, 0] < 1.0 + 1e-9))


def test_cell_orientation_enforced():
    # deliberately inverted cell gets flipped
    points = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    cells = np.array([[0, 2, 1]], dtype=np.int32)
    mesh = SimplexMesh(points, cells)
    assert mesh.cell_volumes[0] > 0


def test_spherical_shell_3d():
    ri, ro = 0.5, 1.0
    mesh, markers = spherical_shell(3, (ri, ro), 8)
    assert mesh.dim == 3
    vol = mesh.cell_volumes.sum()
    exact = 4.0 / 3.0 * np.pi * (ro ** 3 - ri ** 3)
    assert abs(vol - exact) / exact < 0.05   # polygonal sphere deficit
    inner = markers.ids_with_value(
        SphericalAnnulusBoundaryMarkers.interior_boundary.value)
    outer = markers.ids_with_value(
        SphericalAnnulusBoundaryMarkers.exterior_boundary.value)
    assert len(inner) > 0 and len(outer) > 0
    r_in = np.linalg.norm(mesh.facet_midpoints(inner), axis=1)
    assert np.all(r_in < ri + 1e-9)
    r_out = np.linalg.norm(mesh.facet_midpoints(outer), axis=1)
    assert np.all(r_out > 0.9 * ro)
