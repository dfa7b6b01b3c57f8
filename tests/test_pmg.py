"""p-multigrid (P2->P1) velocity preconditioner (ops/pmg.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from navierstokes_project_nm4pde_tpu.fem.geometry import cell_geometry
from navierstokes_project_nm4pde_tpu.fem.space import build_taylor_hood
from navierstokes_project_nm4pde_tpu.mesh import cube_mesh, rectangle_mesh
from navierstokes_project_nm4pde_tpu.ops import operators as ops
from navierstokes_project_nm4pde_tpu.ops.pmg import (
    build_velocity_pmg,
    pmg_coarse_solve,
    pmg_matvec,
    pmg_vals,
    prolong_p,
    restrict_p,
)


def _setup(dim):
    mesh = rectangle_mesh(4, 3) if dim == 2 else cube_mesh(2)
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = space.dirichlet_mask([0])
    return mesh, space, geom, mask


def _dense_p1(mesh, nu, dt, dir_v):
    """Independent dense P1 reaction-diffusion assembly with elimination."""
    dim = mesh.dim
    n_v = mesh.n_vertices
    K = np.zeros((n_v, n_v))
    gref1 = np.concatenate([-np.ones((1, dim)), np.eye(dim)], axis=0)
    nl = dim + 1
    Mref = (np.ones((nl, nl)) + np.eye(nl)) * (
        1.0 / 24.0 if dim == 2 else 1.0 / 120.0
    )
    for e in range(mesh.n_cells):
        vid = mesh.cells[e]
        v = mesh.coords[vid]
        J = (v[1:] - v[:1]).T
        detJ = abs(np.linalg.det(J))
        g = gref1 @ np.linalg.inv(J)
        Ke = detJ * (Mref / dt + nu * (g @ g.T))
        K[np.ix_(vid, vid)] += Ke
    K[dir_v, :] = 0.0
    K[:, dir_v] = 0.0
    K[dir_v, dir_v] = 1.0
    return K


def test_coarse_operator_matches_dense():
    for dim in (2, 3):
        mesh, space, geom, mask = _setup(dim)
        pmg = build_velocity_pmg(space, geom, np.asarray(mask), jnp.float64)
        nu, dt = 0.037, 0.21
        vals, inv_d = pmg_vals(pmg, nu, dt)
        n_v = mesh.n_vertices
        dir_v = np.asarray(mask)[:n_v]
        K = _dense_p1(mesh, nu, dt, dir_v)
        x = np.random.default_rng(0).standard_normal((n_v, 2))
        got = np.asarray(pmg_matvec(pmg, vals, jnp.asarray(x)))
        np.testing.assert_allclose(got, K @ x, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(inv_d), 1.0 / np.diag(K), rtol=1e-10
        )


def test_transfer_operators_adjoint_and_constant():
    """P preserves constants; P^T is the exact adjoint of P (up to the
    Dirichlet masking of the restriction)."""
    mesh, space, geom, mask = _setup(3)
    pmg = build_velocity_pmg(space, geom, np.asarray(mask), jnp.float64)
    n_v, n_u = mesh.n_vertices, space.n_unodes
    # constants: an affine P1 field prolongs to its exact P2 interpolant
    zc = jnp.asarray(
        mesh.coords @ np.array([1.0, -2.0, 0.5]) + 3.0
    )[:, None]
    zf = prolong_p(pmg, zc, n_u)
    coords = space.unode_coords
    want = coords @ np.array([1.0, -2.0, 0.5]) + 3.0
    np.testing.assert_allclose(np.asarray(zf[:, 0]), want, rtol=1e-12)
    # adjoint: <P zc, r> == <zc, P^T r>.  restrict_p masks Dirichlet vertex
    # rows, so test with zc vanishing there (the coarse solve's invariant).
    rng = np.random.default_rng(1)
    r = rng.standard_normal((n_u, 1))
    r[np.asarray(mask)] = 0.0
    za = rng.standard_normal((n_v, 1))
    za[np.asarray(pmg.dir_v)] = 0.0
    zaf = prolong_p(pmg, jnp.asarray(za), n_u)
    lhs = float(np.sum(np.asarray(zaf) * r))
    rhs = float(np.sum(za * np.asarray(restrict_p(pmg, jnp.asarray(r)))))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_coarse_solve_reduces_residual():
    mesh, space, geom, mask = _setup(3)
    pmg = build_velocity_pmg(space, geom, np.asarray(mask), jnp.float64)
    vals, inv_d = pmg_vals(pmg, 1e-3, 0.05)
    rng = np.random.default_rng(2)
    rc = jnp.asarray(rng.standard_normal((pmg.n_v, 3)))
    rc = jnp.where(pmg.dir_v[:, None], 0.0, rc)
    z = pmg_coarse_solve(pmg, vals, inv_d, rc, iters=30, precise=True)
    res = jnp.linalg.norm(pmg_matvec(pmg, vals, z) - rc) / jnp.linalg.norm(rc)
    assert float(res) < 1e-6


def test_projection_step_with_pmg_matches_gmres_f_solver():
    """A projection step preconditioned with pmg converges to the same
    solution as the gmres-smoothed one (same tolerance target)."""
    from navierstokes_project_nm4pde_tpu.config import (
        NumericsConfig,
        PrecondConfig,
        RunConfig,
        SolverConfig,
        TimeConfig,
    )
    from navierstokes_project_nm4pde_tpu.mesh import cylinder_channel_2d
    from navierstokes_project_nm4pde_tpu.models import (
        Cylinder2DProblem,
        NavierStokesSolver,
    )

    mesh = cylinder_channel_2d(lc=0.1)
    sols = {}
    for f_solver, f_iters in (("gmres", 4), ("pmg", 4)):
        cfg = RunConfig(
            time=TimeConfig(dt=0.01, t_end=0.05, stepper="projection"),
            solver=SolverConfig(rtol=1e-8, maxiter=200, tol_mode="b"),
            precond=PrecondConfig(
                kind="yosida", f_iters=f_iters, f_solver=f_solver,
                s_iters=3, s_solver="mg2_cg",
            ),
            numerics=NumericsConfig(dtype="float64", steps_per_chunk=5),
        )
        s = NavierStokesSolver(mesh, Cylinder2DProblem(test_case=2), cfg)
        st, d = s.run(5)
        sols[f_solver] = (np.asarray(st.u), np.asarray(d.iters))
    u_g, it_g = sols["gmres"]
    u_p, it_p = sols["pmg"]
    np.testing.assert_allclose(u_p, u_g, rtol=0, atol=2e-7)
    assert np.all(np.isfinite(it_p))
