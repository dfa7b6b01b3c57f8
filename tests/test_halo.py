"""DoF-sharded halo-exchange apply vs the single-device operator.

The replicated sharded path (tests/test_parallel.py) all-reduces full DoF
vectors; this path (parallel/halo.py) exchanges only subdomain-boundary
slabs -- the scalable counterpart of the reference's owned/ghost model
(ref: src/NavierStokes2D.cpp:71-87, :315-320).  Checks: exact equality
with the unsharded apply, halo sizes bounded well below the global vector,
and the compiled HLO contains collective-permutes but NO all-reduce over
the full DoF space.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from navierstokes_project_nm4pde_tpu.fem.geometry import cell_geometry
from navierstokes_project_nm4pde_tpu.fem.space import build_taylor_hood
from navierstokes_project_nm4pde_tpu.mesh import cube_mesh, cylinder_channel_2d
from navierstokes_project_nm4pde_tpu.ops import operators as ops
from navierstokes_project_nm4pde_tpu.parallel import make_device_mesh
from navierstokes_project_nm4pde_tpu.parallel.halo import (
    build_halo_plan,
    collective_bytes_per_apply,
    halo_apply_system,
    shard_vectors,
    to_natural,
)
from navierstokes_project_nm4pde_tpu.parallel.sharding import (
    _pad_cells,
    shard_operator,
)


def _setup(mesh3d=True):
    mesh = cube_mesh(3) if mesh3d else cylinder_channel_2d(lc=0.1)
    mesh = mesh.reorder_spatial("morton")
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = space.dirichlet_mask([0])
    op = ops.build_operator(space, geom, np.asarray(mask), dtype=jnp.float64)
    return space, op


def _halo_setup(op, n_vertices, n_dev=8):
    dmesh = make_device_mesh(n_dev)
    op_pad = _pad_cells(op, n_dev)
    plan = build_halo_plan(op_pad, n_dev, n_vertices=n_vertices)
    op_sh = shard_operator(op, dmesh)  # pads + shards geometry by cells
    return dmesh, op_pad, op_sh, plan


def test_halo_apply_matches_unsharded():
    space, op = _setup()
    dmesh, op_pad, op_sh, plan = _halo_setup(op, space.mesh.n_vertices)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(space.n_unodes, 3)))
    p = jnp.asarray(rng.normal(size=space.n_pnodes))
    nu, dt = 0.01, 0.05

    w = jnp.asarray(rng.normal(size=(space.n_unodes, 3)))
    conv = ops.convection_setup(op_sh, w)  # cell-sharded tables
    conv_ref = ops.convection_setup(op, w)

    y_u_ref, y_p_ref = ops.apply_system(
        op, nu, dt, conv_ref, u, p, mask_rows=False
    )
    u_sh, p_sh = shard_vectors(plan, dmesh, u, p)
    y_u, y_p = jax.jit(
        lambda a, b: halo_apply_system(op_sh, plan, dmesh, nu, dt, conv, a, b)
    )(u_sh, p_sh)
    np.testing.assert_allclose(
        np.asarray(to_natural(plan.u, y_u)), np.asarray(y_u_ref),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(to_natural(plan.p, y_p)), np.asarray(y_p_ref),
        rtol=1e-12, atol=1e-12,
    )


def test_halo_apply_no_convection():
    space, op = _setup(mesh3d=False)
    dmesh, op_pad, op_sh, plan = _halo_setup(op, space.mesh.n_vertices)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(space.n_unodes, 2)))
    p = jnp.asarray(rng.normal(size=space.n_pnodes))
    y_u_ref, y_p_ref = ops.apply_system(op, 0.02, 0.1, None, u, p, mask_rows=False)
    u_sh, p_sh = shard_vectors(plan, dmesh, u, p)
    y_u, y_p = halo_apply_system(op_sh, plan, dmesh, 0.02, 0.1, None, u_sh, p_sh)
    np.testing.assert_allclose(
        np.asarray(to_natural(plan.u, y_u)), np.asarray(y_u_ref),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(to_natural(plan.p, y_p)), np.asarray(y_p_ref),
        rtol=1e-12, atol=1e-12,
    )


def test_halo_volume_scales_with_boundary():
    """The exchanged halo is a small fraction of the global vectors, and
    the accounting helper reports it against the replicated all-reduce.
    Needs a mesh with boundary << volume per block: 2D at lc=0.04 gives
    ~2k-cell blocks whose contact strips are ~100 nodes."""
    mesh = cylinder_channel_2d(lc=0.04).reorder_spatial("morton")
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    op = ops.build_operator(
        space, geom, np.asarray(space.dirichlet_mask([0])), dtype=jnp.float64
    )
    _, op_pad, _, plan = _halo_setup(op, space.mesh.n_vertices)
    # max halo per (device, shift) x n_shifts, vs owned block size
    halo_rows_per_dev = sum(plan.u.halo_sizes)
    assert 0 < halo_rows_per_dev < 0.35 * plan.u.n_loc, (
        plan.u.halo_sizes, plan.u.n_loc
    )
    stats = collective_bytes_per_apply(plan, dim=2)
    assert stats["halo_bytes_total"] > 0
    assert stats["ratio"] < 0.35  # well under the full-vector all-reduce


def test_halo_hlo_has_permutes_not_allreduce():
    """The compiled program moves halos via collective-permute; the full
    DoF vector is never all-reduced."""
    space, op = _setup()
    dmesh, op_pad, op_sh, plan = _halo_setup(op, space.mesh.n_vertices)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(space.n_unodes, 3)))
    p = jnp.asarray(rng.normal(size=space.n_pnodes))
    u_sh, p_sh = shard_vectors(plan, dmesh, u, p)
    fn = jax.jit(
        lambda a, b: halo_apply_system(op_sh, plan, dmesh, 0.01, 0.05, None, a, b)
    )
    txt = fn.lower(u_sh, p_sh).compile().as_text()
    assert "collective-permute" in txt
    assert "all-reduce" not in txt
