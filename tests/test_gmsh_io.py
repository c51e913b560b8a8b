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
