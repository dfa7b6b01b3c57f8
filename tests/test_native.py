"""Native meshkit kernels vs the numpy fallback (bit-for-bit parity)."""

import numpy as np
import pytest

from navierstokes_project_nm4pde_tpu.mesh import cube_mesh, native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_meshkit()
    if lib is None:
        pytest.skip("meshkit not built (no compiler)")
    return lib


def test_build_edges_matches_numpy(lib):
    from navierstokes_project_nm4pde_tpu.fem.reference import TET_EDGES

    mesh = cube_mesh(3)
    le = np.asarray(TET_EDGES, dtype=np.int32)
    edges_n, ids_n = native.build_edges(mesh.cells, le, mesh.n_vertices)
    # numpy fallback path
    native._LIB, saved = None, native._LIB
    native._TRIED = True
    try:
        edges_p, ids_p = native.build_edges(mesh.cells, le, mesh.n_vertices)
    finally:
        native._LIB = saved
    np.testing.assert_array_equal(edges_n, edges_p)
    np.testing.assert_array_equal(ids_n, ids_p)


def test_invert_map_matches_numpy(lib):
    rng = np.random.default_rng(0)
    flat = rng.integers(0, 500, 20000).astype(np.int32)
    s_n, c_n = native.invert_map(flat, 500, pad_value=len(flat))
    native._LIB, saved = None, native._LIB
    try:
        s_p, c_p = native.invert_map(flat, 500, pad_value=len(flat))
    finally:
        native._LIB = saved
    np.testing.assert_array_equal(c_n, c_p)
    np.testing.assert_array_equal(s_n, s_p)


def test_match_facets(lib):
    mesh = cube_mesh(3)
    res = native.match_facets(mesh.cells, mesh.bface_verts)
    assert res is not None
    bc, bl = res
    for f in range(0, mesh.n_bfaces, 7):
        cell = set(mesh.cells[bc[f]].tolist())
        face = set(mesh.bface_verts[f].tolist())
        assert face < cell
        assert mesh.cells[bc[f]][bl[f]] not in face
