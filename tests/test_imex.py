"""IMEX convection partition (TimeConfig.convection="imex").

The convection term is split per cell: CFL-critical cells keep the
reference's linearised implicit C(w) (ref: src/NavierStokes2D.cpp:253),
the rest move to the explicit rhs.  Invariants tested here:

  * all-implicit classification reproduces convection="implicit" exactly
    (the masked operator degenerates to the full C);
  * all-explicit classification matches convection="explicit" physics
    (same K solve + N(u^n) rhs, different solver plumbing);
  * the constant-K BSR fast path (vel_apply="bsr") equals the masked
    element-fold fallback on a genuinely mixed partition;
  * apply_bsr_scalar equals the element-pass K apply.
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
from navierstokes_project_nm4pde_tpu.mesh import cylinder_channel_2d, cylinder_duct_3d
from navierstokes_project_nm4pde_tpu.models import (
    Cylinder2DProblem,
    Cylinder3DProblem,
    NavierStokesSolver,
)
from navierstokes_project_nm4pde_tpu.ops import operators as ops
from navierstokes_project_nm4pde_tpu.ops.bsr import apply_bsr_scalar, build_velocity_kbsr


def _cfg(convection, vel_apply="auto", umax=None, cfl=0.07, dt=1e-3):
    return RunConfig(
        time=TimeConfig(dt=dt, t_end=1.0, stepper="projection",
                        convection=convection, imex_umax=umax, imex_cfl=cfl),
        solver=SolverConfig(rtol=1e-11, restart=20, maxiter=100,
                            tol_mode="b", guess_order=2),
        precond=PrecondConfig(kind="yosida", f_iters=0, s_iters=3,
                              mg2_form="additive"),
        numerics=NumericsConfig(
            dtype="float64", precise_dots=False, steps_per_chunk=2,
            vel_apply=vel_apply,
        ),
    )


def test_kbsr_matches_element_K():
    """apply_bsr_scalar(K) == the convection-free element-pass F apply."""
    from navierstokes_project_nm4pde_tpu.fem.geometry import cell_geometry
    from navierstokes_project_nm4pde_tpu.fem.space import build_taylor_hood
    from navierstokes_project_nm4pde_tpu.ops.tables import build_ref_tables

    mesh = cylinder_duct_3d(lc=0.25, nz=3).reorder_spatial("rcm")
    space = build_taylor_hood(mesh)
    geom = cell_geometry(space)
    mask = space.dirichlet_mask([0, 2, 3])
    op = ops.build_operator(space, geom, mask, dtype=jnp.float64)
    nu, dt = 1e-3, 2e-4
    kbsr = build_velocity_kbsr(
        space, geom, build_ref_tables(3), nu, dt, bs=16, dtype=jnp.float64
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(space.n_unodes, 3)))
    y_ref = ops.apply_F(op, nu, dt, None, u)
    y_bsr = apply_bsr_scalar(kbsr, u)
    np.testing.assert_allclose(
        np.asarray(y_bsr), np.asarray(y_ref), rtol=1e-11, atol=1e-12
    )


def test_imex_all_implicit_matches_implicit():
    """umax huge => every cell implicit => identical trajectory to the
    plain implicit mode."""
    mesh = cylinder_duct_3d(lc=0.25, nz=3)
    problem = Cylinder3DProblem(test_case=2)
    s_imp = NavierStokesSolver(mesh, problem, _cfg("implicit"))
    st_imp, _ = s_imp.run(2)
    s_imx = NavierStokesSolver(mesh, problem, _cfg("imex", umax=1e9))
    assert s_imx._imex_frac == 1.0
    assert s_imx._kbsr is not None  # fast path built (subset = everything)
    st_imx, _ = s_imx.run(2)
    np.testing.assert_allclose(
        np.asarray(st_imx.u), np.asarray(st_imp.u), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(st_imx.p), np.asarray(st_imp.p), rtol=1e-8, atol=1e-10
    )


def test_imex_all_explicit_matches_explicit():
    """umax tiny => every cell explicit => same physics as the explicit
    mode (CG vs FGMRES on the same SPD K, AB1 rhs on step 0.. BDF1)."""
    mesh = cylinder_duct_3d(lc=0.25, nz=3)
    problem = Cylinder3DProblem(test_case=2)
    s_exp = NavierStokesSolver(mesh, problem, _cfg("explicit", dt=2e-4))
    st_exp, _ = s_exp.run(2)
    s_imx = NavierStokesSolver(
        mesh, problem, _cfg("imex", umax=1e-9, dt=2e-4)
    )
    assert s_imx._imex_frac == 0.0
    st_imx, _ = s_imx.run(2)
    np.testing.assert_allclose(
        np.asarray(st_imx.u), np.asarray(st_exp.u), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st_imx.p), np.asarray(st_exp.p), rtol=1e-6, atol=1e-8
    )


def test_imex_mixed_bsr_matches_element_fallback():
    """A genuinely mixed partition: the kbsr + fine-subset fast path must
    equal the masked element-fold fallback (identical operator)."""
    mesh = cylinder_duct_3d(lc=0.22, nz=3)
    problem = Cylinder3DProblem(test_case=2)
    # h* = umax*dt/cfl = 0.129 sits inside this mesh's edge-length range
    # (graded in-plane ~0.08 near the cylinder, ~0.2+ far), so the graded
    # cells go implicit and the far field explicit
    cfgs = dict(convection="imex", umax=9.0, cfl=0.07, dt=1e-3)
    s_fast = NavierStokesSolver(mesh, problem, _cfg(vel_apply="bsr", **cfgs))
    assert 0.0 < s_fast._imex_frac < 1.0, (
        f"partition degenerate: {s_fast._imex_frac}"
    )
    st_fast, d_fast = s_fast.run(2)
    s_fall = NavierStokesSolver(
        mesh, problem, _cfg(vel_apply="element", **cfgs)
    )
    st_fall, d_fall = s_fall.run(2)
    np.testing.assert_allclose(
        np.asarray(st_fast.u), np.asarray(st_fall.u), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(st_fast.p), np.asarray(st_fall.p), rtol=1e-7, atol=1e-9
    )


def test_imex_2d_runs_and_stays_finite():
    """2D DFG smoke with a mixed partition over several steps."""
    mesh = cylinder_channel_2d(lc=0.1)
    cfg = RunConfig(
        time=TimeConfig(dt=2e-3, t_end=1.0, stepper="projection",
                        convection="imex", imex_umax=1.5, imex_cfl=0.07),
        solver=SolverConfig(rtol=1e-8, restart=20, maxiter=100,
                            tol_mode="b", guess_order=2),
        precond=PrecondConfig(kind="yosida", f_iters=0, s_iters=3,
                              mg2_form="additive"),
        numerics=NumericsConfig(dtype="float64", precise_dots=False,
                                steps_per_chunk=3),
    )
    solver = NavierStokesSolver(mesh, Cylinder2DProblem(test_case=2), cfg)
    state, diags = solver.run(6)
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert np.all(np.isfinite(np.asarray(diags.residual)))
