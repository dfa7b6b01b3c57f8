"""2D DFG cylinder end-to-end smoke tests (coarse mesh, few steps).

The full-length benchmark (T=8, 800 steps; ref: src/main2D.cpp:21-22) runs in
bench/CLI; here we check several steps of the full pipeline stay finite,
the solver converges, and the functionals behave physically.
"""

import numpy as np
import pytest

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


@pytest.fixture(scope="module")
def solver():
    mesh = cylinder_channel_2d(lc=0.06)
    cfg = RunConfig(
        time=TimeConfig(dt=0.01, t_end=8.0),
        solver=SolverConfig(rtol=1e-8, restart=60, maxiter=200),
        precond=PrecondConfig(kind="asimple", f_iters=6, s_iters=30),
        numerics=NumericsConfig(dtype="float64", precise_dots=False, steps_per_chunk=5),
    )
    return NavierStokesSolver(mesh, Cylinder2DProblem(test_case=2), cfg)


def test_short_run(solver):
    state, diags = solver.run(10)
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert np.all(np.isfinite(np.asarray(state.p)))
    assert np.all(diags.iters < 200)
    # ramped inlet: velocity magnitude grows but stays bounded
    umax = np.abs(np.asarray(state.u)).max()
    assert 0.0 < umax < 5.0
    # drag on the cylinder should be positive (flow pushes downstream)
    assert diags.drag[-1] > 0.0
    assert np.all(np.isfinite(diags.c_d))
    assert np.all(np.isfinite(diags.delta_p))


def test_dirichlet_values_respected(solver):
    state, _ = solver.run(3)
    t = float(state.t)
    space = solver.space
    u = np.asarray(state.u)
    # walls + cylinder no-slip
    wall_nodes = space.boundary_unodes([2, 3])
    np.testing.assert_allclose(u[wall_nodes], 0.0, atol=1e-10)
    # inlet profile at the final time
    inlet_nodes = space.boundary_unodes([0])
    # walls take precedence at corners (matching reference overwrite order)
    inlet_nodes = np.setdiff1d(inlet_nodes, wall_nodes)
    y = space.unode_coords[inlet_nodes, 1]
    H, um = 0.41, 1.5
    expect = 4 * um * y * (H - y) * np.sin(np.pi * t / 8.0) / H**2
    np.testing.assert_allclose(u[inlet_nodes, 0], expect, atol=1e-8)
    np.testing.assert_allclose(u[inlet_nodes, 1], 0.0, atol=1e-10)
