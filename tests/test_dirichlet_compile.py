"""Unit coverage of every BC-type compilation path.

Each velocity/pressure BC kind must constrain exactly the right dofs with
the right values, including the variants no end-to-end test exercises
(no_tangential_flux, function_component with time dependence, pressure
functions).  Complements the reference's tests/test_function_assigner.py
level of granularity.
"""

import numpy as np
import pytest

from navierstokes_tpu.fem.bcs import (PressureBCType, TractionBCType,
                                      VelocityBCType)
from navierstokes_tpu.fem.dirichlet import compile_dirichlet_bcs
from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_cube


@pytest.fixture(scope="module")
def space_and_markers():
    mesh, markers = hyper_cube(2, 4)
    return TaylorHoodSpace(mesh), markers


def _boundary_nodes(space, markers, value):
    return np.asarray(space.facet_unodes(markers.ids_with_value(value)))


def test_no_slip(space_and_markers):
    space, markers = space_and_markers
    bcs, _ = compile_dirichlet_bcs(
        space, markers, [(VelocityBCType.no_slip, M.left.value, None)], [])
    nodes = _boundary_nodes(space, markers, M.left.value)
    expected = np.sort(np.concatenate([2 * nodes, 2 * nodes + 1]))
    assert np.array_equal(np.sort(bcs.dofs), expected)
    assert np.all(bcs.values() == 0.0)


def test_no_normal_and_tangential_flux(space_and_markers):
    space, markers = space_and_markers
    # left face: normal = -e_x -> component 0 constrained
    bcs, _ = compile_dirichlet_bcs(
        space, markers,
        [(VelocityBCType.no_normal_flux, M.left.value, None)], [])
    nodes = _boundary_nodes(space, markers, M.left.value)
    assert np.array_equal(np.sort(bcs.dofs), np.sort(2 * nodes))

    # top face: normal = e_y -> tangential components = {x}
    bcs, _ = compile_dirichlet_bcs(
        space, markers,
        [(VelocityBCType.no_tangential_flux, M.top.value, None)], [])
    nodes = _boundary_nodes(space, markers, M.top.value)
    assert np.array_equal(np.sort(bcs.dofs), np.sort(2 * nodes))


def test_constant_and_component(space_and_markers):
    space, markers = space_and_markers
    bcs, _ = compile_dirichlet_bcs(
        space, markers,
        [(VelocityBCType.constant, M.top.value, (2.0, -1.0)),
         (VelocityBCType.constant_component, M.bottom.value, 1, 3.0)], [])
    vals = bcs.values()
    top_nodes = _boundary_nodes(space, markers, M.top.value)
    lookup = dict(zip(bcs.dofs.tolist(), vals.tolist()))
    for n in top_nodes:
        assert lookup[2 * n] == 2.0
        assert lookup[2 * n + 1] == -1.0
    bottom_nodes = _boundary_nodes(space, markers, M.bottom.value)
    for n in bottom_nodes:
        assert lookup[2 * n + 1] == 3.0
        assert 2 * n not in lookup or n in top_nodes


def test_function_and_time_dependence(space_and_markers):
    space, markers = space_and_markers
    fn = lambda x, t: np.stack([x[:, 1] * t, 0 * x[:, 0]], axis=1)
    comp_fn = lambda x, t: x[:, 0] + t
    bcs, _ = compile_dirichlet_bcs(
        space, markers,
        [(VelocityBCType.function, M.left.value, fn),
         (VelocityBCType.function_component, M.top.value, 0, comp_fn)], [])
    assert bcs.time_dependent
    vals = bcs.values(t=2.0)
    lookup = dict(zip(bcs.dofs.tolist(), vals.tolist()))
    left_nodes = _boundary_nodes(space, markers, M.left.value)
    for n in left_nodes:
        y = space.u_coords[n, 1]
        # the top-left corner node is overwritten by the later top BC
        if abs(space.u_coords[n, 1] - 1.0) > 1e-12:
            assert np.isclose(lookup[2 * n], 2.0 * y)
    top_nodes = _boundary_nodes(space, markers, M.top.value)
    for n in top_nodes:
        assert np.isclose(lookup[2 * n], space.u_coords[n, 0] + 2.0)


def test_pressure_bcs(space_and_markers):
    space, markers = space_and_markers
    pfun = lambda x: 5.0 * x[:, 1]
    bcs, mean = compile_dirichlet_bcs(
        space, markers, [],
        [(PressureBCType.constant, M.right.value, 7.0),
         (PressureBCType.function, M.left.value, pfun),
         (PressureBCType.mean_value, None, 1.5)])
    assert mean == 1.5
    vals = bcs.values()
    lookup = dict(zip(bcs.dofs.tolist(), vals.tolist()))
    right = np.asarray(space.facet_pnodes(
        markers.ids_with_value(M.right.value)))
    for n in right:
        assert lookup[space.pressure_offset + n] == 7.0
    left = np.asarray(space.facet_pnodes(
        markers.ids_with_value(M.left.value)))
    for n in left:
        expected = 5.0 * space.p_coords[n, 1]
        assert np.isclose(lookup[space.pressure_offset + n], expected)


def test_last_bc_wins_on_shared_corners(space_and_markers):
    space, markers = space_and_markers
    bcs, _ = compile_dirichlet_bcs(
        space, markers,
        [(VelocityBCType.no_slip, M.left.value, None),
         (VelocityBCType.constant, M.top.value, (1.0, 0.0))], [])
    vals = bcs.values()
    lookup = dict(zip(bcs.dofs.tolist(), vals.tolist()))
    # top-left corner node: the later (lid) BC wins, like sequentially
    # applied dolfin DirichletBCs
    corner = np.where((np.abs(space.u_coords[:, 0]) < 1e-12)
                      & (np.abs(space.u_coords[:, 1] - 1.0) < 1e-12))[0][0]
    assert lookup[2 * corner] == 1.0
