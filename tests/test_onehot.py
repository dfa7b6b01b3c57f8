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


def test_vmapped_scatter_u_routes_through_onehot():
    """NSOperator.onehot: vmapped reductions must match the XLA plan."""
    import dataclasses as dc

    import jax

    from navierstokes_project_nm4pde_tpu.fem.geometry import cell_geometry
    from navierstokes_project_nm4pde_tpu.ops import operators as ops

    mesh = cylinder_duct_3d(lc=0.12, nz=4).reorder_spatial("rcm")
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = np.zeros(space.n_unodes, dtype=bool)
    op = ops.build_operator(space, geom, mask, dtype=jnp.float32)
    plans = build_onehot_plans(
        np.asarray(space.cells_u), mesh.n_vertices, space.n_unodes,
        cells_per_block=128, nb_vertex=64, nb_edge=128, window_chunk=512,
    )
    op_oh = dc.replace(op, onehot=plans)

    rng = np.random.default_rng(4)
    y_e = jnp.asarray(
        rng.standard_normal((4, space.mesh.n_cells, 10, 3)), jnp.float32
    )
    ref = jax.vmap(lambda y: ops.scatter_u(op, y))(y_e)
    out = jax.vmap(lambda y: ops.scatter_u(op_oh, y))(y_e)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4)
    # unbatched calls stay on the XLA plan path and agree exactly
    np.testing.assert_allclose(
        np.asarray(ops.scatter_u(op_oh, y_e[0])),
        np.asarray(ops.scatter_u(op, y_e[0])),
    )


def test_ensemble_onehot_end_to_end():
    """run_ensemble with numerics.ensemble_onehot=True stays finite and
    matches the plain vmapped ensemble's solver trajectory."""
    import dataclasses as dc

    from navierstokes_project_nm4pde_tpu.config import (
        NumericsConfig, PrecondConfig, RunConfig, SolverConfig, TimeConfig,
    )
    from navierstokes_project_nm4pde_tpu.models import (
        Cylinder3DProblem, NavierStokesSolver,
    )
    from navierstokes_project_nm4pde_tpu.parallel.ensemble import run_ensemble

    mesh = cylinder_duct_3d(lc=0.14, nz=3)
    cfg = RunConfig(
        time=TimeConfig(dt=2e-4, t_end=4.0),
        solver=SolverConfig(rtol=1e-6, restart=10, maxiter=40),
        precond=PrecondConfig(kind="yosida", f_iters=3, s_iters=2, s_solver="mg2_cg"),
        numerics=NumericsConfig(
            dtype="float32", steps_per_chunk=2, ensemble_onehot=True
        ),
    )
    nus = [1e-3, 2e-3]
    solver = NavierStokesSolver(mesh, Cylinder3DProblem(test_case=2), cfg)
    assert solver.op.onehot is not None
    state, diags = run_ensemble(solver, nus, 2)
    assert np.isfinite(np.asarray(state.u)).all()

    # apples-to-apples: same RCM node numbering, only the reduce path differs
    cfg0 = dc.replace(
        cfg,
        numerics=dc.replace(
            cfg.numerics, ensemble_onehot=False, spatial_reorder=False
        ),
    )
    solver0 = NavierStokesSolver(
        mesh.reorder_spatial("rcm"), Cylinder3DProblem(test_case=2), cfg0
    )
    _, diags0 = run_ensemble(solver0, nus, 2)
    np.testing.assert_allclose(
        np.asarray(diags.drag), np.asarray(diags0.drag), rtol=2e-3, atol=1e-4
    )


def test_onehot_wide_payload_chunks(setup):
    """C > 128 payloads (large ensembles) split into 128-lane kernel calls;
    results must match plain indexing / segment sum exactly."""
    import jax.numpy as jnp

    from navierstokes_project_nm4pde_tpu.ops.onehot import (
        onehot_gather,
        onehot_reduce,
    )

    cells, n_u, plans = setup
    rng = np.random.default_rng(11)
    C = 320  # 3 lane chunks, last one partially padded
    x = rng.standard_normal((n_u, C)).astype(np.float32)
    y = onehot_gather(plans, jnp.asarray(x))
    assert y.shape == (cells.size, C)
    np.testing.assert_allclose(np.asarray(y), x[cells.reshape(-1)], rtol=0, atol=0)
    ye = rng.standard_normal((cells.size, C)).astype(np.float32)
    out = onehot_reduce(plans, jnp.asarray(ye))
    ref = np.zeros((n_u, C), np.float32)
    np.add.at(ref, cells.reshape(-1), ye)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-5)
