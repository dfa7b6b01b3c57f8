"""Poiseuille channel flow: the P2-P1 discretization must reproduce the
exact steady solution (parabolic velocity is exactly representable in P2,
linear pressure in P1), so after time marching the discrete solution should
match to solver tolerance -- a sharp end-to-end correctness check the
reference never had."""

import numpy as np

from navierstokes_project_nm4pde_tpu.config import (
    NumericsConfig,
    PrecondConfig,
    RunConfig,
    SolverConfig,
    TimeConfig,
)
from navierstokes_project_nm4pde_tpu.mesh import rectangle_mesh
from navierstokes_project_nm4pde_tpu.models import NavierStokesSolver
from navierstokes_project_nm4pde_tpu.models.base import ProblemSpec

H = 1.0
L = 2.0
NU = 0.05
UMAX = 1.0


def poiseuille_problem():
    import jax.numpy as jnp

    def inlet(x, t):
        y = x[:, 1]
        ux = 4.0 * UMAX * y * (H - y) / (H * H)
        return jnp.stack([ux, jnp.zeros_like(ux)], axis=1)

    def zero(x, t):
        return jnp.zeros_like(x)

    return ProblemSpec(
        dim=2,
        nu=NU,
        dirichlet={0: inlet, 2: zero},
    )


def test_poiseuille_exact():
    mesh = rectangle_mesh(8, 4, lx=L, ly=H)
    cfg = RunConfig(
        time=TimeConfig(dt=0.1, t_end=10.0),
        solver=SolverConfig(rtol=1e-10, restart=80, maxiter=400),
        precond=PrecondConfig(kind="asimple", f_iters=8, s_iters=40),
        numerics=NumericsConfig(dtype="float64", precise_dots=False, steps_per_chunk=10),
    )
    solver = NavierStokesSolver(mesh, poiseuille_problem(), cfg)
    state, diags = solver.run(100)  # march to steady state

    coords = solver.space.unode_coords
    y = coords[:, 1]
    u_exact = 4.0 * UMAX * y * (H - y) / (H * H)
    u = np.asarray(state.u)
    err = np.abs(u[:, 0] - u_exact).max()
    assert err < 1e-6, err
    assert np.abs(u[:, 1]).max() < 1e-6
    # pressure is linear in x: dp/dx = -8 nu Umax / H^2
    # (use solver.mesh: the solver spatially reorders its mesh copy)
    p = np.asarray(state.p)
    x = solver.mesh.coords[:, 0]
    slope = np.polyfit(x, p, 1)[0]
    expect = -8.0 * NU * UMAX / H**2
    assert abs(slope - expect) / abs(expect) < 1e-4
