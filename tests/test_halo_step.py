"""A full projection time step under the owned+halo plan vs single-device.

parallel/halo_step.py carries the reference's owned/ghost execution model
(ref: src/NavierStokes2D.cpp:71-87, :315-320) through a COMPLETE production
step: velocity FGMRES with psum'd reductions and halo ppermutes, replicated
frozen-Schur CG, halo-reduced projection update.  The equality bar is the
same as the cell-sharded replicated-path tests (tests/test_parallel.py).
"""

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
from navierstokes_project_nm4pde_tpu.parallel import make_device_mesh
from navierstokes_project_nm4pde_tpu.parallel.halo import (
    collective_bytes_per_apply,
)
from navierstokes_project_nm4pde_tpu.parallel.halo_step import (
    HaloProjectionStep,
)


def _cfg():
    return RunConfig(
        time=TimeConfig(dt=1e-3, t_end=1.0, stepper="projection"),
        solver=SolverConfig(rtol=1e-10, restart=8, maxiter=80,
                            tol_mode="b", extrapolate_guess=False),
        precond=PrecondConfig(kind="yosida", f_iters=0, s_iters=3,
                              mg2_form="additive"),
        numerics=NumericsConfig(
            dtype="float64", precise_dots=False, steps_per_chunk=1,
            proj_schur="frozen", schur_spmv="auto",
        ),
    )


def test_halo_projection_step_matches_single_device():
    mesh = cylinder_duct_3d(lc=0.3, nz=3)
    problem = Cylinder3DProblem(test_case=2)

    s1 = NavierStokesSolver(mesh, problem, _cfg())
    state1, d1 = s1.run(2)

    s2 = NavierStokesSolver(mesh, problem, _cfg())
    hs = HaloProjectionStep(s2, make_device_mesh(8))
    st0 = s2.initial_state()
    u_own, p = hs.shard(st0.u), st0.p
    iters = []
    for k in range(2):
        u_own, p, itf, its = hs(u_own, p, k)
        iters.append((int(itf), int(its)))
    u = np.asarray(hs.unshard(u_own))

    assert all(f > 0 and s > 0 for f, s in iters), iters
    # Both paths converge to atol ~ rtol*||b|| through DIFFERENT summation
    # orders (halo slab reduces + psum'd dots vs global gather-sum plans),
    # so states agree to the solver tolerance, not to fp: the observed max
    # deviation is ~1e-9 absolute at rtol=1e-10.
    np.testing.assert_allclose(
        u, np.asarray(state1.u), rtol=1e-6, atol=5e-9
    )
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(state1.p), rtol=1e-6, atol=5e-8
    )


def test_halo_step_collective_volume_bounded():
    """The halo step's velocity-space collectives move boundary slabs, not
    global vectors: the per-apply exchanged volume must be a small
    fraction of the replicated path's full-vector all-reduce."""
    mesh = cylinder_duct_3d(lc=0.3, nz=3)
    problem = Cylinder3DProblem(test_case=2)
    s = NavierStokesSolver(mesh, problem, _cfg())
    hs = HaloProjectionStep(s, make_device_mesh(8))
    vol = collective_bytes_per_apply(hs.plan, s.space.dim, itemsize=8)
    assert vol["ratio"] < 0.5, vol
