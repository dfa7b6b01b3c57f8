"""Single-run one-hot REDUCE experiment on the live TPU.

The apply-phase split (PERFORMANCE.md round 2) shows the velocity reduce
at ~12.4 ms/apply vs 3.7 ms for the forward gather at 609k DoF.  The
windowed one-hot reduce kernel's MXU cost is lane-count-independent up to
128 lanes, and it measured 2x faster than the XLA plan at C=192
(ensembles) -- so it may ALSO win for single runs (C=dim padded to 128),
which round 1 never measured.  This script times, under RCM ordering:

  a. forward gather alone            (locality check vs the Morton default)
  b. folded apply, table reduce      (the current single-run path)
  c. folded apply, one-hot reduce    (the candidate)

Usage: python scripts/prof_onehot_single.py [lc] [nz]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from navierstokes_project_nm4pde_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax
import jax.numpy as jnp

from navierstokes_project_nm4pde_tpu.config import (
    NumericsConfig,
    RunConfig,
    TimeConfig,
)
from navierstokes_project_nm4pde_tpu.mesh import cylinder_duct_3d
from navierstokes_project_nm4pde_tpu.models import (
    Cylinder3DProblem,
    NavierStokesSolver,
)
from navierstokes_project_nm4pde_tpu.ops import operators as ops
from navierstokes_project_nm4pde_tpu.ops.onehot import onehot_reduce
from navierstokes_project_nm4pde_tpu.ops.scatter import apply_gather_plan

REPS = 30


def timeit(fn, data, u0):
    def prog(data, u):
        def body(_, v):
            out = fn(data, v)
            return out / (1e-30 + jnp.max(jnp.abs(out)))

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, u))

    # float() readback barrier: block_until_ready releases EARLY on the
    # axon relay (measured 0.013 ms reported for a ~20 ms apply chain).
    jprog = jax.jit(prog)
    float(jprog(data, u0))  # compile
    float(jprog(data, u0))  # settle relay caches
    t0 = time.perf_counter()
    float(jprog(data, u0))
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.028
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    mesh = cylinder_duct_3d(lc=lc, nz=nz)
    # ensemble_onehot=True -> RCM ordering + one-hot plans on the operator
    cfg = RunConfig(
        time=TimeConfig(dt=2e-4, t_end=4.0),
        numerics=NumericsConfig(ensemble_onehot=True),
    )
    solver = NavierStokesSolver(mesh, Cylinder3DProblem(test_case=2), cfg)
    op = solver.op
    nu, dt = solver.problem.nu, cfg.time.dt
    n, d = solver.space.n_unodes, solver.space.dim
    E, nloc = op.cells_u.shape
    print(f"# {mesh.n_cells} cells, {solver.space.n_dofs} DoFs (RCM)",
          file=sys.stderr, flush=True)

    key = jax.random.PRNGKey(0)
    u0 = jax.random.normal(key, (n, d), dtype=jnp.float32)
    conv = ops.convection_setup(op, u0, fold=(nu, dt))

    # correctness first (interpret-free, real kernel)
    y_e = jnp.einsum("eij,ejc->eic", conv.F_e, ops.gather_u(op, u0))
    flat = y_e.reshape(-1, d)
    want = apply_gather_plan(op.plan_u, flat)
    got = onehot_reduce(op.onehot, flat, precise=True)
    err = float(jnp.max(jnp.abs(got - want)) /
                (1e-30 + float(jnp.max(jnp.abs(want)))))
    assert err < 1e-5, err
    print(f"# one-hot reduce == table reduce (rel err {err:.1e})",
          file=sys.stderr, flush=True)

    results = {"dofs": solver.space.n_dofs}
    results["baseline"] = timeit(lambda _, v: v + 1.0, None, u0)

    def gather_only(dd, v):
        u_e = ops.gather_u(dd, v)
        s = jnp.sum(u_e, axis=(0, 1))
        return v + s[None, :]

    results["gather_rcm"] = timeit(gather_only, op, u0)

    def folded_table(data, v):
        dd, fe = data
        y = jnp.einsum("eij,ejc->eic", fe, ops.gather_u(dd, v))
        return apply_gather_plan(dd.plan_u, y.reshape(-1, d))

    results["apply_table_rcm"] = timeit(folded_table, (op, conv.F_e), u0)

    def folded_onehot(data, v):
        dd, fe = data
        y = jnp.einsum("eij,ejc->eic", fe, ops.gather_u(dd, v))
        return onehot_reduce(dd.onehot, y.reshape(-1, d), precise=True)

    results["apply_onehot_rcm"] = timeit(folded_onehot, (op, conv.F_e), u0)

    def folded_onehot_fast(data, v):
        dd, fe = data
        y = jnp.einsum("eij,ejc->eic", fe, ops.gather_u(dd, v))
        return onehot_reduce(dd.onehot, y.reshape(-1, d))

    results["apply_onehot_rcm_bf16"] = timeit(
        folded_onehot_fast, (op, conv.F_e), u0
    )

    base = results["baseline"]
    out = {k: round(v - base, 3) if k.startswith(("gather", "apply")) else v
           for k, v in results.items()}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
