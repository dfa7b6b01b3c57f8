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
