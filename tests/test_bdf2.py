"""Temporal convergence: BDF2 must be 2nd order in dt, BDF1 1st order.

Fixed coarse mesh; errors measured against a small-dt reference run on the
SAME mesh, isolating the time-discretisation error."""

import dataclasses

import numpy as np

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

T_END = 0.2


def run_scheme(mesh, scheme, dt):
    cfg = RunConfig(
        time=TimeConfig(dt=dt, t_end=T_END, scheme=scheme),
        solver=SolverConfig(rtol=1e-10, restart=60, maxiter=300),
        precond=PrecondConfig(kind="asimple", f_iters=6, s_iters=35),
        numerics=NumericsConfig(dtype="float64", precise_dots=False,
                                steps_per_chunk=8),
    )
    solver = NavierStokesSolver(mesh, EthierSteinmanProblem(), cfg)
    n = round(T_END / dt)
    state, _ = solver.run(n)
    assert abs(float(state.t) - T_END) < 1e-12
    return np.asarray(state.u)


def test_bdf2_second_order_in_time():
    mesh = cube_mesh(2)
    ref = run_scheme(mesh, "bdf2", T_END / 64)
    errs = {}
    for scheme in ("bdf1", "bdf2"):
        e = []
        for nsteps in (4, 8):
            u = run_scheme(mesh, scheme, T_END / nsteps)
            e.append(np.sqrt(np.mean((u - ref) ** 2)))
        errs[scheme] = e
    rate1 = np.log2(errs["bdf1"][0] / errs["bdf1"][1])
    rate2 = np.log2(errs["bdf2"][0] / errs["bdf2"][1])
    assert 0.7 < rate1 < 1.5, (errs, rate1)
    assert rate2 > 1.7, (errs, rate2)
    # BDF2 strictly more accurate at equal dt
    assert errs["bdf2"][1] < errs["bdf1"][1]
