"""3D DFG cylinder smoke test (tiny extruded mesh, few steps, CPU)."""

import numpy as np

from navierstokes_project_nm4pde_tpu.config import (
    NumericsConfig,
    PrecondConfig,
    RunConfig,
    SolverConfig,
    TimeConfig,
)
from navierstokes_project_nm4pde_tpu.mesh import cylinder_duct_3d
from navierstokes_project_nm4pde_tpu.models import (
    Cylinder3DProblem,
    NavierStokesSolver,
)


def test_short_run_3d():
    mesh = cylinder_duct_3d(lc=0.12, nz=3)
    cfg = RunConfig(
        time=TimeConfig(dt=2e-4, t_end=4.0),
        solver=SolverConfig(rtol=1e-7, restart=40, maxiter=150),
        precond=PrecondConfig(kind="yosida", f_iters=4, s_iters=25),
        numerics=NumericsConfig(dtype="float64", precise_dots=False, steps_per_chunk=3),
    )
    solver = NavierStokesSolver(mesh, Cylinder3DProblem(test_case=2), cfg)
    state, diags = solver.run(3)
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert np.all(diags.iters < 150)
    # inlet no-slip respected on walls and cylinder
    u = np.asarray(state.u)
    wall = solver.space.boundary_unodes([2, 3])
    np.testing.assert_allclose(u[wall], 0.0, atol=1e-10)
    # drag positive once the flow is moving
    assert diags.drag[-1] > 0.0
    assert np.isfinite(diags.delta_p[-1])


def test_forces_3d_tangent_derivative_contraction():
    """forces_3d must integrate nu * d(u.t)/dn = nu * t . grad(u) . n (the
    DFG definition).  On a linear field u = A x the gradient is exactly A
    (P2 exact), so the quadrature value is computable independently.  The
    reference's transposed contraction n . grad(u) . t (NavierStokes3D.cpp
    :810) is the tangential derivative of the normal velocity -- identically
    zero on flat no-slip facets -- and would fail this test on an
    asymmetric A."""
    from navierstokes_project_nm4pde_tpu.ops.functionals import forces_3d

    mesh = cylinder_duct_3d(lc=0.12, nz=3)
    cfg = RunConfig(
        time=TimeConfig(dt=2e-4, t_end=4.0),
        numerics=NumericsConfig(dtype="float64", precise_dots=False),
    )
    solver = NavierStokesSolver(mesh, Cylinder3DProblem(test_case=2), cfg)
    ft = solver.forces
    # general quadratic field (P2-exact, spatially varying gradient so the
    # closed-surface integral does not cancel): u_c = x . Q_c . x
    rng = np.random.default_rng(3)
    Q = rng.standard_normal((3, 3, 3))
    x = np.asarray(solver.space.unode_coords)
    u = np.einsum("ni,cij,nj->nc", x, Q, x)
    p_val = 1.7
    p = np.full(solver.space.n_pnodes, p_val)
    nu = 1e-3
    drag, lift = forces_3d(ft, u, p, nu)

    n = -np.asarray(ft.normal, np.float64)  # into-fluid normal
    jxw = np.asarray(ft.jxw, np.float64)
    u_e = u[np.asarray(ft.cells_u)]
    gu = np.einsum(
        "fqid,fic->fqcd", np.asarray(ft.grad_u, np.float64), u_e
    )  # du_c/dx_d at boundary quadrature points
    nx, ny = n[:, 0], n[:, 1]
    t = np.stack([ny, -nx, np.zeros_like(nx)], axis=1)
    t2 = (t * t).sum(axis=1)
    # the DFG definition: d(u.t)/dn = sum_{c,d} t_c du_c/dx_d n_d
    tgn = np.einsum("fc,fqcd,fd->fq", t, gu, n) / t2[:, None]
    exp_drag = ((nu * tgn * ny[:, None] - p_val * nx[:, None]) * jxw).sum()
    exp_lift = -((nu * tgn * nx[:, None] + p_val * ny[:, None]) * jxw).sum()
    assert abs(exp_drag) > 1e-8  # non-degenerate check
    np.testing.assert_allclose(float(drag), exp_drag, rtol=1e-9)
    np.testing.assert_allclose(float(lift), exp_lift, rtol=1e-9)
    # the transposed (reference) contraction must NOT be what we compute
    ngt = np.einsum("fc,fqcd,fd->fq", n, gu, t) / t2[:, None]
    wrong = ((nu * ngt * ny[:, None] - p_val * nx[:, None]) * jxw).sum()
    assert abs(wrong - exp_drag) > 1e-9


def test_backflow_stabilization_runs():
    """Backflow term on the outlet: stays finite, adds only a PSD term
    (identical solution when there is no inflow through the outlet yet)."""
    mesh = cylinder_duct_3d(lc=0.12, nz=3)
    from navierstokes_project_nm4pde_tpu.models.base import ProblemSpec
    import dataclasses

    base = Cylinder3DProblem(test_case=2)
    prob_bf = dataclasses.replace(base, backflow_tag=1)
    cfg = RunConfig(
        time=TimeConfig(dt=2e-4, t_end=4.0),
        solver=SolverConfig(rtol=1e-8, restart=40, maxiter=150),
        precond=PrecondConfig(kind="yosida", f_iters=4, s_iters=25),
        numerics=NumericsConfig(dtype="float64", precise_dots=False, steps_per_chunk=2),
    )
    s_bf = NavierStokesSolver(mesh, prob_bf, cfg)
    st_bf, d_bf = s_bf.run(2)
    assert np.all(np.isfinite(np.asarray(st_bf.u)))
    s0 = NavierStokesSolver(mesh, base, cfg)
    st0, d0 = s0.run(2)
    # early in the ramp there is no outlet backflow -> term inactive
    np.testing.assert_allclose(
        np.asarray(st_bf.u), np.asarray(st0.u), atol=1e-6
    )
