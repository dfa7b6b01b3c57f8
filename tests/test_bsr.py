"""Supernode BSR applies (ops/bsr.py): exactness vs the element-pass paths.

The BSR forms are assembled once from the host divergence ELL; they must
reproduce the element-pass divergence D u (ref: src/NavierStokes2D.cpp:262)
and gradient G p = -D^T p (ref: src/NavierStokes2D.cpp:259) to assembly
roundoff, on meshes whose node counts are NOT multiples of the block size
(padding paths), and survive an end-to-end projection step unchanged.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_project_nm4pde_tpu.config import (
    NumericsConfig,
    PrecondConfig,
    RunConfig,
    SolverConfig,
    TimeConfig,
)
from navierstokes_project_nm4pde_tpu.mesh import (
    cube_mesh,
    cylinder_channel_2d,
    cylinder_duct_3d,
)
from navierstokes_project_nm4pde_tpu.models import (
    Cylinder2DProblem,
    Cylinder3DProblem,
    NavierStokesSolver,
)
from navierstokes_project_nm4pde_tpu.ops import operators as ops
from navierstokes_project_nm4pde_tpu.ops.bsr import (
    apply_bsr,
    build_bsr,
    build_divergence_bsr,
    build_gradient_bsr,
)


def _setup_op(mesh, bs):
    from navierstokes_project_nm4pde_tpu.fem.geometry import cell_geometry
    from navierstokes_project_nm4pde_tpu.fem.space import build_taylor_hood

    mesh = mesh.reorder_spatial("rcm")
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = space.dirichlet_mask([0, 2])
    op, host = ops.build_operator(
        space, geom, mask, dtype=jnp.float64, want_host_schur=True
    )
    dbsr = build_divergence_bsr(
        host, space.n_unodes, space.n_pnodes, bs=bs, dtype=jnp.float64
    )
    gbsr = build_gradient_bsr(
        host, space.n_unodes, space.n_pnodes, bs=bs, dtype=jnp.float64
    )
    return space, op, dbsr, gbsr


@pytest.mark.parametrize(
    "mesh,bs",
    [
        (cube_mesh(2), 8),  # n_p = 27: exercises ragged-tail padding
        (cylinder_channel_2d(lc=0.1), 32),
        (cylinder_duct_3d(lc=0.25, nz=3), 16),
    ],
)
def test_bsr_divergence_and_gradient_match_element(mesh, bs):
    space, op, dbsr, gbsr = _setup_op(mesh, bs)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(space.n_unodes, space.dim)))
    p = jnp.asarray(rng.normal(size=space.n_pnodes))

    d_ref = ops.apply_divergence(op, u)
    d_bsr = apply_bsr(dbsr, u)[:, 0]
    np.testing.assert_allclose(
        np.asarray(d_bsr), np.asarray(d_ref), rtol=1e-12, atol=1e-13
    )

    g_ref = ops.apply_gradient(op, p)
    g_bsr = apply_bsr(gbsr, p[:, None])
    np.testing.assert_allclose(
        np.asarray(g_bsr), np.asarray(g_ref), rtol=1e-12, atol=1e-13
    )


def test_bsr_operator_dispatch():
    """apply_divergence / apply_gradient route through dbsr / gbsr."""
    mesh = cylinder_channel_2d(lc=0.12)
    space, op, dbsr, gbsr = _setup_op(mesh, 32)
    op2 = dataclasses.replace(op, dbsr=dbsr, gbsr=gbsr)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(space.n_unodes, space.dim)))
    p = jnp.asarray(rng.normal(size=space.n_pnodes))
    np.testing.assert_allclose(
        np.asarray(ops.apply_divergence(op2, u)),
        np.asarray(ops.apply_divergence(op, u)),
        rtol=1e-12, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(ops.apply_gradient(op2, p)),
        np.asarray(ops.apply_gradient(op, p)),
        rtol=1e-12, atol=1e-13,
    )


def test_bsr_random_rectangular():
    """build_bsr on a random rectangular COO operator with Cout x Cin
    blocks, checked against the dense matvec."""
    rng = np.random.default_rng(2)
    n_rows, n_src, Cout, Cin = 53, 41, 2, 3
    nnz = 300
    rc = rng.integers(0, n_rows * n_src, size=nnz)
    rc = np.unique(rc)
    rows, cols = rc // n_src, rc % n_src
    vals = rng.normal(size=(len(rc), Cout, Cin))
    m = build_bsr(rows, cols, vals, n_rows, n_src, bs=8, dtype=jnp.float64)
    x = rng.normal(size=(n_src, Cin))
    y = np.asarray(apply_bsr(m, jnp.asarray(x)))
    dense = np.zeros((n_rows, Cout, n_src, Cin))
    dense[rows, :, cols, :] = vals
    y_ref = np.einsum("rosi,si->ro", dense, x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-13)
    # einsum lowering agrees with the VPU broadcast form
    m2 = dataclasses.replace(m, contraction="einsum")
    np.testing.assert_allclose(
        np.asarray(apply_bsr(m2, jnp.asarray(x))), y_ref, rtol=1e-12,
        atol=1e-13,
    )


def test_projection_step_bsr_matches_element():
    """One full projection step with the BSR D/G vs the element-pass forms
    (which also exercises the aux-gather FGMRES vs plain FGMRES switch)."""
    mesh = cylinder_duct_3d(lc=0.22, nz=3)

    def run(grad, div):
        cfg = RunConfig(
            time=TimeConfig(dt=1e-3, t_end=1.0, stepper="projection"),
            solver=SolverConfig(rtol=1e-10, restart=20, maxiter=80,
                                tol_mode="b", guess_order=2),
            precond=PrecondConfig(kind="yosida", f_iters=0, s_iters=3,
                                  mg2_form="additive"),
            numerics=NumericsConfig(
                dtype="float64", precise_dots=False, steps_per_chunk=2,
                grad_apply=grad, div_apply=div,
            ),
        )
        solver = NavierStokesSolver(mesh, Cylinder3DProblem(test_case=2), cfg)
        state, diags = solver.run(2)
        return state, diags

    s_el, d_el = run("element", "element")
    s_bsr, d_bsr = run("bsr", "bsr")
    np.testing.assert_allclose(
        np.asarray(s_bsr.u), np.asarray(s_el.u), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s_bsr.p), np.asarray(s_el.p), rtol=1e-7, atol=1e-9
    )
