"""Two-level Schur preconditioner units: coarse reduction + quality."""

import jax.numpy as jnp
import numpy as np

from navierstokes_project_nm4pde_tpu.fem.geometry import cell_geometry
from navierstokes_project_nm4pde_tpu.fem.space import build_taylor_hood
from navierstokes_project_nm4pde_tpu.mesh import cube_mesh
from navierstokes_project_nm4pde_tpu.ops import operators as ops
from navierstokes_project_nm4pde_tpu.ops.coarse import (
    coarse_factor,
    prolong,
    restrict,
    twolevel_apply,
)
from navierstokes_project_nm4pde_tpu.ops.schur_ell import (
    assemble_schur_values,
    schur_ell_diag,
    schur_ell_matvec,
)


def setup_op():
    mesh = cube_mesh(3).reorder_spatial()
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = space.dirichlet_mask([0, 1, 2, 4, 5])
    return ops.build_operator(space, geom, mask, dtype=jnp.float64), space


def test_coarse_matrix_consistency():
    """Sc = R S R^T : reducing via the static plan must equal the direct
    computation through the fine SpMV."""
    op, space = setup_op()
    inv = jnp.where(op.dirichlet_mask, 0.0, 1.0 / (op.diagM / 1e-2))
    vals = assemble_schur_values(op.schur, inv)
    cs = op.coarse
    cho = coarse_factor(cs, vals)
    # direct: Sc[:, j] = R S R^T e_j
    nc = cs.nc
    n_p = space.n_pnodes
    cols = []
    for j in range(0, nc, max(1, nc // 6)):
        ej = jnp.zeros(nc, jnp.float64).at[j].set(1.0)
        col = restrict(cs, schur_ell_matvec(op.schur, vals, prolong(cs, ej, n_p)))
        cols.append((j, np.asarray(col)))
    sc = np.asarray(
        __import__("navierstokes_project_nm4pde_tpu.ops.scatter",
                   fromlist=["apply_gather_plan"]).apply_gather_plan(
            cs.plan, vals[:, None])[:, 0]
    ).reshape(nc, nc)
    for j, col in cols:
        np.testing.assert_allclose(sc[:, j], col, rtol=1e-9, atol=1e-12)


def test_host_assembly_matches_device():
    """The host (numpy) frozen-Schur assembly must reproduce the device
    per-step assembly: values, diagonal slots, and the dense coarse
    matrix (the frozen projection path ships only these to the device)."""
    from navierstokes_project_nm4pde_tpu.ops.coarse import (
        coarse_dense,
        host_coarse_dense,
    )
    from navierstokes_project_nm4pde_tpu.ops.schur_ell import (
        host_assemble_schur_values,
    )

    mesh = cube_mesh(3).reorder_spatial()
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = space.dirichlet_mask([0, 1, 2, 4, 5])
    op, host = ops.build_operator(
        space, geom, mask, dtype=jnp.float64, want_host_schur=True
    )
    inv = np.where(np.asarray(mask), 0.0, 1.0 / (host["diagM"] / 1e-2))
    vals_h = host_assemble_schur_values(host, inv)
    vals_d = assemble_schur_values(op.schur, jnp.asarray(inv))
    np.testing.assert_allclose(vals_h, np.asarray(vals_d), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        vals_h[host["diag_slot"]],
        np.asarray(schur_ell_diag(op.schur, vals_d)),
        rtol=1e-12,
    )
    Sc_h = host_coarse_dense(host, vals_h, op.coarse.nc, op.coarse.agg)
    Sc_d = np.asarray(coarse_dense(op.coarse, vals_d))
    np.testing.assert_allclose(Sc_h, Sc_d, rtol=1e-10, atol=1e-12)


def test_twolevel_beats_jacobi():
    op, space = setup_op()
    inv = jnp.where(op.dirichlet_mask, 0.0, 1.0 / (op.diagM / 1e-2))
    vals = assemble_schur_values(op.schur, inv)
    diag = schur_ell_diag(op.schur, vals)
    diag = jnp.where(diag > 0, diag, 1.0)
    cho = coarse_factor(op.coarse, vals)

    def S(p):
        return schur_ell_matvec(op.schur, vals, p)

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.normal(size=space.n_pnodes))
    r = r - r.mean()  # orthogonal to the constant null space
    z2 = twolevel_apply(op.coarse, cho, S, 1.0 / diag, r)
    zj = 0.7 * r / diag
    res2 = np.linalg.norm(np.asarray(r - S(z2) - (r - S(z2)).mean()))
    resj = np.linalg.norm(np.asarray(r - S(zj) - (r - S(zj)).mean()))
    assert res2 < resj


def test_frozen_spgemm_matches_pair_tables():
    """The frozen-path SpGEMM builder (build_schur_frozen) must reproduce
    the pair-enumeration S1 as an OPERATOR: same dense matrix, diagonal,
    and coarse reduction.  (The pattern itself may be tighter -- scipy
    prunes entries that are numerically zero under the frozen inv.)"""
    from navierstokes_project_nm4pde_tpu.ops.coarse import host_coarse_dense
    from navierstokes_project_nm4pde_tpu.ops.schur_ell import (
        host_assemble_schur_values,
    )

    def dense_S(host, vals):
        n_p = int(host["srow"].max()) + 1
        S = np.zeros((n_p, n_p))
        m = host["smask"]
        S[host["srow"][m], host["scol"][m]] = vals[m]
        return S

    mesh = cube_mesh(3).reorder_spatial()
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = space.dirichlet_mask([0, 1, 2, 4, 5])
    op_d, host_d = ops.build_operator(
        space, geom, mask, dtype=jnp.float64, want_host_schur=True
    )
    inv1 = np.where(np.asarray(mask), 0.0, 1.0 / host_d["diagM"])
    vals_ref = host_assemble_schur_values(host_d, inv1)

    op_f, host_f = ops.build_operator(
        space, geom, mask, dtype=jnp.float64,
        device_schur_assembly=False, want_host_schur=True,
    )
    S_ref = dense_S(host_d, vals_ref)
    S_new = dense_S(host_f, host_f["vals1"])
    np.testing.assert_allclose(S_new, S_ref, rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(
        host_f["vals1"][host_f["diag_slot"]],
        vals_ref[host_d["diag_slot"]],
        rtol=1e-11, atol=1e-13,
    )
    assert op_f.coarse.nc == op_d.coarse.nc
    Sc_ref = host_coarse_dense(host_d, vals_ref, op_d.coarse.nc, op_d.coarse.agg)
    Sc_new = host_coarse_dense(host_f, host_f["vals1"], op_f.coarse.nc, op_f.coarse.agg)
    np.testing.assert_allclose(Sc_new, Sc_ref, rtol=1e-10, atol=1e-12)
