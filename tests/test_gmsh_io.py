"""gmsh interop: .geo physical-name parsing and MSH 2.2 import."""

import numpy as np

from navierstokes_tpu.mesh.gmsh_io import extract_facet_markers, read_msh

GEO = """\
// sample geometry
Point(1) = {0, 0, 0, 1.0};
Physical Curve("inlet", 102) = {1};
Physical Line("outlet", 103) = {2};
Physical Curve("wall", 100) = {3, 4};
Physical Surface("fluid", 200) = {1};
"""

# unit square split into two triangles, boundary lines tagged
MSH = """\
$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
6
1 1 2 102 1 1 2
2 1 2 103 2 2 3
3 1 2 100 3 3 4
4 1 2 100 3 4 1
5 2 2 200 1 1 2 3
6 2 2 200 1 1 3 4
$EndElements
"""


# the same unit square in modern MSH 4.1 (entity blocks; physical tags
# resolved through the $Entities records)
MSH41 = """\
$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
4 4 1 0
1 0 0 0 0
2 1 0 0 0
3 1 1 0 0
4 0 1 0 0
1 0 0 0 1 0 0 1 102 2 1 -2
2 1 0 0 1 1 0 1 103 2 2 -3
3 0 1 0 1 1 0 1 100 2 3 -4
4 0 0 0 0 1 0 1 100 2 4 -1
1 0 0 0 1 1 0 1 200 4 1 2 3 4
$EndEntities
$Nodes
5 4 1 4
0 1 0 1
1
0 0 0
0 2 0 1
2
1 0 0
0 3 0 1
3
1 1 0
0 4 0 1
4
0 1 0
2 1 0 0
$EndNodes
$Elements
5 6 1 6
1 1 1 1
1 1 2
1 2 1 1
2 2 3
1 3 1 1
3 3 4
1 4 1 1
4 4 1
2 1 2 2
5 1 2 3
6 1 3 4
$EndElements
"""


def test_extract_facet_markers(tmp_path):
    geo = tmp_path / "sample.geo"
    geo.write_text(GEO)
    markers = extract_facet_markers(str(geo))
    assert markers == {"inlet": 102, "outlet": 103, "wall": 100}


def test_read_msh(tmp_path):
    msh = tmp_path / "sample.msh"
    msh.write_text(MSH)
    mesh, markers = read_msh(str(msh))
    assert mesh.dim == 2
    assert mesh.n_cells == 2
    assert mesh.n_vertices == 4
    assert np.isclose(mesh.cell_volumes.sum(), 1.0)
    # all four boundary edges carry their physical tags
    assert len(markers.facet_ids) == 4
    assert set(markers.values.tolist()) == {100, 102, 103}
    inlet = markers.ids_with_value(102)
    mids = mesh.facet_midpoints(inlet)
    assert np.allclose(mids, [[0.5, 0.0]])


def test_read_msh41(tmp_path):
    """The modern gmsh 4.1 ASCII format loads to the identical mesh."""
    msh = tmp_path / "sample41.msh"
    msh.write_text(MSH41)
    mesh, markers = read_msh(str(msh))
    assert mesh.dim == 2
    assert mesh.n_cells == 2
    assert mesh.n_vertices == 4
    assert np.isclose(mesh.cell_volumes.sum(), 1.0)
    assert len(markers.facet_ids) == 4
    assert set(markers.values.tolist()) == {100, 102, 103}
    inlet = markers.ids_with_value(102)
    assert np.allclose(mesh.facet_midpoints(inlet), [[0.5, 0.0]])

    # 2.2 and 4.1 readers agree exactly
    msh2 = tmp_path / "sample.msh"
    msh2.write_text(MSH)
    mesh2, markers2 = read_msh(str(msh2))
    assert np.array_equal(mesh.points, mesh2.points)
    assert np.array_equal(mesh.cells, mesh2.cells)
    order = np.argsort(markers.facet_ids)
    order2 = np.argsort(markers2.facet_ids)
    assert np.array_equal(markers.facet_ids[order],
                          markers2.facet_ids[order2])
    assert np.array_equal(markers.values[order], markers2.values[order2])
