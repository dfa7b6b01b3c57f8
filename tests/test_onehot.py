"""Windowed one-hot MXU gather/reduce kernels (ops/onehot.py).

Runs in Pallas interpret mode on CPU (conftest forces the cpu backend);
on TPU the same code path compiles via Mosaic.  Reference semantics:
gather = x[cells_flat], reduce = segment-sum over cells_flat.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from navierstokes_project_nm4pde_tpu.fem.space import build_taylor_hood
from navierstokes_project_nm4pde_tpu.mesh import cylinder_channel_2d, cylinder_duct_3d
from navierstokes_project_nm4pde_tpu.ops.onehot import (
    build_onehot_plans,
    onehot_gather,
    onehot_reduce,
)


@pytest.fixture(scope="module")
def setup():
    mesh = cylinder_duct_3d(lc=0.12, nz=4).reorder_spatial("rcm")
    space = build_taylor_hood(mesh)
    cells = np.asarray(space.cells_u)
    plans = build_onehot_plans(
        cells,
        mesh.n_vertices,
        space.n_unodes,
        cells_per_block=128,
        nb_vertex=64,
        nb_edge=128,
        window_chunk=512,
    )
    return cells, space.n_unodes, plans


def test_rcm_reorder_spans_bounded():
    """RCM must bound per-node cell spans (the window-width prerequisite)."""
    mesh = cylinder_duct_3d(lc=0.12, nz=4)
    for method, factor in [("morton", None), ("rcm", 0.35)]:
        m = mesh.reorder_spatial(method)
        space = build_taylor_hood(m)
        cells = np.asarray(space.cells_u, dtype=np.int64)
        E, nloc = cells.shape
        first = np.full(space.n_unodes, E, np.int64)
        last = np.full(space.n_unodes, -1, np.int64)
        ci = np.repeat(np.arange(E), nloc)
        np.minimum.at(first, cells.reshape(-1), ci)
        np.maximum.at(last, cells.reshape(-1), ci)
        span_max = int((last - first + 1).max())
        if factor is not None:
            assert span_max < factor * E, (method, span_max, E)


def test_onehot_gather_matches_indexing(setup):
    cells, n_u, plans = setup
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_u, 128)).astype(np.float32)
    y = onehot_gather(plans, jnp.asarray(x))
    assert y.shape == (cells.size, 128)
    np.testing.assert_allclose(np.asarray(y), x[cells.reshape(-1)], rtol=0, atol=0)


def test_onehot_reduce_matches_segment_sum(setup):
    cells, n_u, plans = setup
    rng = np.random.default_rng(1)
    ye = rng.standard_normal((cells.size, 128)).astype(np.float32)
    out = onehot_reduce(plans, jnp.asarray(ye))
    ref = np.zeros((n_u, 128), np.float32)
    np.add.at(ref, cells.reshape(-1), ye)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_onehot_roundtrip_is_valence_scaling(setup):
    """reduce(gather(x)) multiplies each row by its valence."""
    cells, n_u, plans = setup
    x = np.ones((n_u, 128), np.float32)
    val = np.bincount(cells.reshape(-1), minlength=n_u).astype(np.float32)
    out = onehot_reduce(plans, onehot_gather(plans, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(out)[:, 0], val, rtol=1e-6)


def test_onehot_2d_mesh():
    """P2 triangles (6 local nodes, 3 vertices) go through the same plans."""
    mesh = cylinder_channel_2d(lc=0.05).reorder_spatial("rcm")
    space = build_taylor_hood(mesh)
    cells = np.asarray(space.cells_u)
    plans = build_onehot_plans(
        cells, mesh.n_vertices, space.n_unodes,
        cells_per_block=64, nb_vertex=64, nb_edge=128, window_chunk=512,
    )
    rng = np.random.default_rng(2)
    x = rng.standard_normal((space.n_unodes, 128)).astype(np.float32)
    y = onehot_gather(plans, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x[cells.reshape(-1)])
