"""Ethier-Steinman manufactured-solution integration tests.

This is the framework's primary correctness gate, mirroring the reference's
`convergence` executable (ref: src/main_convergence3D.cpp, SURVEY.md section 4):
one semi-implicit step on a refinement ladder must show ~3rd-order L2 /
~2nd-order H1 spatial convergence of the P2 velocity.
"""

import dataclasses

import numpy as np
import pytest

from navierstokes_project_nm4pde_tpu.config import (
    NumericsConfig,
    PrecondConfig,
    RunConfig,
    SolverConfig,
    TimeConfig,
)
from navierstokes_project_nm4pde_tpu.mesh import cube_mesh
from navierstokes_project_nm4pde_tpu.models import (
    EthierSteinmanProblem,
    NavierStokesSolver,
)
from navierstokes_project_nm4pde_tpu.models.ethier_steinman import (
    exact_velocity,
    exact_velocity_gradient,
)
from navierstokes_project_nm4pde_tpu.ops.functionals import (
    build_error_tables,
    velocity_error_norms,
)

DT = 4e-4


def make_config(precond="asimple", dt=DT, rtol=1e-9):
    return RunConfig(
        time=TimeConfig(dt=dt, t_end=dt),
        solver=SolverConfig(rtol=rtol, restart=60, maxiter=300),
        precond=PrecondConfig(kind=precond, f_iters=6, s_iters=40),
        numerics=NumericsConfig(dtype="float64", precise_dots=False, steps_per_chunk=1),
    )


def run_one_step(n, precond="asimple"):
    mesh = cube_mesh(n)
    problem = EthierSteinmanProblem()
    solver = NavierStokesSolver(mesh, problem, make_config(precond))
    state, diags = solver.run(1)
    et = build_error_tables(solver.space, solver.geom, degree=5, dtype=np.float64)
    l2, h1 = velocity_error_norms(
        et, state.u, exact_velocity, exact_velocity_gradient, float(state.t)
    )
    return float(l2), float(h1), diags


def test_single_step_accuracy_and_convergence():
    l2_c, h1_c, diags_c = run_one_step(2)
    l2_f, h1_f, diags_f = run_one_step(4)
    # solver actually converged (residual is absolute; rhs ~ |u|/dt)
    assert int(diags_c.iters[-1]) < 300
    assert int(diags_f.iters[-1]) < 300
    rate_l2 = np.log2(l2_c / l2_f)
    rate_h1 = np.log2(h1_c / h1_f)
    # P2 velocity: ~3rd order in L2, ~2nd order in H1.
    assert rate_l2 > 2.4, (l2_c, l2_f, rate_l2)
    assert rate_h1 > 1.6, (h1_c, h1_f, rate_h1)


@pytest.mark.parametrize(
    "kind", ["asimple", "simple", "yosida", "ayosida", "block_triangular"]
)
def test_preconditioners_converge(kind):
    l2, h1, diags = run_one_step(2, precond=kind)
    assert int(diags.iters[-1]) < 300, (kind, diags.iters)
    assert l2 < 0.3, (kind, l2)


def test_simple_beats_identity():
    mesh = cube_mesh(2)
    problem = EthierSteinmanProblem()
    s_id = NavierStokesSolver(mesh, problem, make_config("block_identity", rtol=1e-6))
    s_as = NavierStokesSolver(mesh, problem, make_config("asimple", rtol=1e-6))
    _, d_id = s_id.run(1)
    _, d_as = s_as.run(1)
    assert int(d_as.iters[-1]) < int(d_id.iters[-1])
