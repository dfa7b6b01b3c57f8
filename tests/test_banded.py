"""Block-banded frozen-Schur SpMV (ops/banded.py).

The frozen projection Schur S1 is restructured at setup into a block-banded
dense form (static 128-lane tile windows + batched matvec) that must be
EXACTLY the same operator as the bucketed ELL SpMV it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np

from navierstokes_project_nm4pde_tpu.config import (
    NumericsConfig,
    RunConfig,
    TimeConfig,
)
from navierstokes_project_nm4pde_tpu.mesh import (
    cylinder_channel_2d,
    cylinder_duct_3d,
)
from navierstokes_project_nm4pde_tpu.models import (
    Cylinder2DProblem,
    Cylinder3DProblem,
    NavierStokesSolver,
)
from navierstokes_project_nm4pde_tpu.ops.banded import (
    build_banded_schur,
    banded_matvec,
)
from navierstokes_project_nm4pde_tpu.ops.schur_ell import schur_ell_matvec


def test_banded_matvec_matches_coo():
    """Random band-limited COO matrix: banded form reproduces the dense
    matvec exactly (same entries, zero padding)."""
    rng = np.random.default_rng(3)
    n = 300
    rows, cols, vals = [], [], []
    for i in range(n):
        nbrs = np.unique(
            np.clip(i + rng.integers(-40, 41, size=6), 0, n - 1)
        )
        rows.append(np.full(len(nbrs), i))
        cols.append(nbrs)
        vals.append(rng.normal(size=len(nbrs)))
    rows, cols, vals = map(np.concatenate, (rows, cols, vals))
    # dedupe (i, j)
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]

    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    p = rng.normal(size=n).astype(np.float32)

    band = build_banded_schur(rows, cols, vals, n, block_rows=32)
    got = np.asarray(banded_matvec(band, jnp.asarray(p)))
    want = dense.astype(np.float32) @ p
    assert np.max(np.abs(got - want)) < 1e-4 * np.max(np.abs(want))


def test_banded_schur_matches_ell_3d():
    mesh = cylinder_duct_3d(lc=0.14, nz=4)
    cfg = RunConfig(time=TimeConfig(dt=1e-3, t_end=1.0, stepper="projection"))
    s = NavierStokesSolver(mesh, Cylinder3DProblem(test_case=2), cfg)
    fz = s._proj_schur
    assert fz is not None and fz.band is not None
    n_p = fz.diag1.shape[0]
    p = jax.random.normal(jax.random.PRNGKey(0), (n_p,), jnp.float32)
    a = schur_ell_matvec(s.op.schur, fz.vals1, p)
    b = banded_matvec(fz.band, p)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    assert err < 1e-5


def test_banded_step_matches_ell_functionals():
    """Five projection steps with the banded vs ELL Schur SpMV give the
    same DFG functionals to solver tolerance (node orderings differ: the
    banded path switches the mesh to RCM)."""
    mesh = cylinder_channel_2d(lc=0.05)
    tc = TimeConfig(dt=2e-3, t_end=1.0, stepper="projection")
    sb = NavierStokesSolver(
        mesh, Cylinder2DProblem(test_case=2), RunConfig(time=tc)
    )
    assert sb._proj_schur.band is not None
    se = NavierStokesSolver(
        mesh,
        Cylinder2DProblem(test_case=2),
        RunConfig(time=tc, numerics=NumericsConfig(schur_spmv="ell")),
    )
    assert se._proj_schur.band is None
    _, db = sb.run(5)
    _, de = se.run(5)
    for k in ("c_d", "delta_p"):
        a = np.asarray(getattr(db, k))[-1]
        b = np.asarray(getattr(de, k))[-1]
        assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), (k, a, b)
