"""Native C++ topology kernels: build, parity with NumPy, and integration."""

import numpy as np
import pytest

from navierstokes_tpu import native
from navierstokes_tpu.parallel.sharded import _numpy_scatter_transpose


@pytest.fixture(scope="module")
def lib():
    lib = native.get_library()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_unique_rows_matches_numpy(lib):
    rng = np.random.default_rng(7)
    rows = rng.integers(0, 50, size=(4000, 3)).astype(np.int32)
    rows = np.sort(rows, axis=1)
    uniq, inverse, counts = native.unique_rows(rows)
    ref_u, ref_i, ref_c = np.unique(rows, axis=0, return_inverse=True,
                                    return_counts=True)
    assert np.array_equal(uniq, ref_u)
    assert np.array_equal(inverse, ref_i)
    assert np.array_equal(counts, ref_c)
    # reconstruction property
    assert np.array_equal(uniq[inverse], rows)


def test_build_transpose_matches_numpy(lib):
    rng = np.random.default_rng(8)
    flat = rng.integers(0, 200, size=5000).astype(np.int32)
    table, K = native.build_transpose(flat, 200)
    ref_table, ref_K = _numpy_scatter_transpose(flat, 200)
    assert K == ref_K
    # same multiset of slots per node (order within a node may differ)
    assert np.array_equal(np.sort(table, axis=1), np.sort(ref_table, axis=1))
    # padded entries point one past the end
    assert table.max() <= len(flat)


def test_mesh_topology_native_vs_fallback(monkeypatch):
    """SimplexMesh topology must be identical with and without the native
    kernels."""
    from navierstokes_tpu.mesh import hyper_cube

    mesh_native, _ = hyper_cube(3, 3)

    import navierstokes_tpu.native as nat

    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_load_attempted", True)
    mesh_fallback, _ = hyper_cube(3, 3)

    assert np.array_equal(mesh_native.facets, mesh_fallback.facets)
    assert np.array_equal(mesh_native.edges, mesh_fallback.edges)
    assert np.array_equal(mesh_native.cell_edges, mesh_fallback.cell_edges)
    assert np.array_equal(mesh_native.exterior_facet_mask,
                          mesh_fallback.exterior_facet_mask)
