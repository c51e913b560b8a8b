"""XDMF mesh input/output and the shipped-.geo end-to-end pipeline.

Covers the reference's mesh interchange path (grid_tools.py:70-121 write,
grid_generator.py:406-437 read): XDMF roundtrip with HDF5 and inline data
items, facet-marker association, and a user-supplied .geo/.msh pair
reaching a converged solve.
"""

import os

import numpy as np
import pytest

from navierstokes_tpu.mesh import (backward_facing_step, hyper_cube,
                                   read_xdmf_mesh, write_xdmf_mesh)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _assert_same(mesh, markers, m2, k2):
    assert m2.n_cells == mesh.n_cells
    assert np.allclose(m2.points, mesh.points)
    a = {(tuple(sorted(mesh.facets[f])), int(v))
         for f, v in zip(markers.facet_ids, markers.values)}
    b = {(tuple(sorted(m2.facets[f])), int(v))
         for f, v in zip(k2.facet_ids, k2.values)}
    assert a == b


def test_xdmf_roundtrip_hdf5(tmp_path):
    pytest.importorskip("h5py")
    mesh, markers, _ = backward_facing_step(resolution=0.25)
    path = str(tmp_path / "bfs.xdmf")
    fpath = write_xdmf_mesh(path, mesh, facet_markers=markers)
    assert os.path.exists(fpath) and os.path.exists(path[:-5] + ".h5")
    m2, k2 = read_xdmf_mesh(path)
    _assert_same(mesh, markers, m2, k2)


def test_xdmf_roundtrip_inline(tmp_path, monkeypatch):
    # force the no-h5py path: inline XML data items
    import navierstokes_tpu.mesh.xdmf_io as xio

    monkeypatch.setattr(xio, "_h5py", lambda: None)
    mesh, markers = hyper_cube(2, 5)
    path = str(tmp_path / "cube.xdmf")
    write_xdmf_mesh(path, mesh, facet_markers=markers)
    assert not os.path.exists(path[:-5] + ".h5")
    m2, k2 = read_xdmf_mesh(path)
    _assert_same(mesh, markers, m2, k2)


def test_xdmf_3d_roundtrip(tmp_path):
    mesh, markers = hyper_cube(3, 3)
    path = str(tmp_path / "cube3.xdmf")
    write_xdmf_mesh(path, mesh, facet_markers=markers)
    m2, k2 = read_xdmf_mesh(path)
    _assert_same(mesh, markers, m2, k2)


def test_read_rejects_facet_file_as_mesh(tmp_path):
    mesh, markers = hyper_cube(2, 4)
    path = str(tmp_path / "m.xdmf")
    fpath = write_xdmf_mesh(path, mesh, facet_markers=markers)
    with pytest.raises(ValueError, match="codim-1"):
        read_xdmf_mesh(fpath)


def test_shipped_geo_pipeline_to_solve():
    """A user-supplied .geo (+ pre-generated .msh) reaches a converged
    stationary solve: the reference's external-mesh workflow
    (tests/test_grid_generator.py:57-69 + demo/backward_facing_step.py)."""
    from navierstokes_tpu.fem.bcs import PressureBCType, VelocityBCType
    from navierstokes_tpu.mesh.gmsh_io import read_geo_msh
    from navierstokes_tpu.solvers import StationarySolver

    geo = os.path.join(REPO, "meshes", "backward_facing_step.geo")
    mesh, markers, mm = read_geo_msh(geo)
    assert set(mm) == {"inlet", "outlet", "walls"}
    assert mesh.n_cells > 500
    # physical tags in the msh match the .geo declarations
    assert set(np.unique(markers.values)) == set(mm.values())

    def inlet_profile(x):
        y0, h = 0.5, 0.5
        s = (x[:, 1] - y0) / h
        return np.stack([6.0 * s * (1.0 - s), np.zeros(len(x))], axis=1)

    solver = StationarySolver(mesh, markers, tol=1e-10)
    solver.set_boundary_conditions((
        (VelocityBCType.function, mm["inlet"], inlet_profile),
        (VelocityBCType.no_slip, mm["walls"], None),
        (PressureBCType.constant, mm["outlet"], 0.0)))
    solver.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 1.0 / 50.0,
         "pressure_term": 1.0, "coriolis_term": None,
         "euler_term": None, "body_force_term": None})
    solver.solve()
    u, _ = solver.space.split(solver.solution)
    # mass conservation: inflow flux equals outflow flux
    assert np.all(np.isfinite(u))
    assert np.abs(u).max() > 1.0  # nontrivial flow


def test_generate_xdmf_mesh_from_shipped_msh(tmp_path):
    from navierstokes_tpu.mesh import generate_xdmf_mesh

    msh = os.path.join(REPO, "meshes", "backward_facing_step.msh")
    out = str(tmp_path / "bfs.xdmf")
    path = generate_xdmf_mesh(msh, out=out)
    m2, k2 = read_xdmf_mesh(path)
    assert m2.n_cells > 500 and len(k2.facet_ids) > 0
