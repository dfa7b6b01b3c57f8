"""Crash-test + microbench: within-VMEM row gather in a Pallas kernel.

The fused element-apply design (VERDICT round-3 item 1: panel-local
two-level gather) stands or falls on one primitive: random ROW access
into a VMEM-resident window.  Round 3 measured `tpu.dynamic_gather`
axis 0 CRASHING the remote compile helper and axis 1 slow; this script
re-tests the primitive standalone at realistic shapes before any kernel
work builds on it.

Usage: python scripts/prof_pallas_gather.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from navierstokes_project_nm4pde_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20


def timeit(f, *args):
    def prog(*a):
        def body(_, v):
            out = f(*a[:-1], v)
            return v * (1.0 + 1e-30 * jnp.max(jnp.abs(out)))

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, a[-1]))

    jp = jax.jit(prog)
    float(jp(*args))
    float(jp(*args))
    t0 = time.perf_counter()
    float(jp(*args))
    return (time.perf_counter() - t0) / REPS * 1e3


def gather_kernel(idx_ref, src_ref, out_ref):
    # Mosaic supports ONLY the same-shape form (dynamic_gather /
    # take_along_axis: out[i, j] = src[idx[i, j], j]); arbitrary
    # [n_out != n_src] row gathers fail to lower ("Cannot do int
    # indexing on TPU" / "Shape mismatch in input, indices and output").
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


def run_case(n_src, width, reps_in_kernel=1, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(n_src, width)), dtype)
    idx = jnp.asarray(
        rng.integers(0, n_src, size=(n_src, width)), jnp.int32
    )

    def call(idx_, src_):
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((n_src, width), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx_, src_)

    y = call(idx, src)
    ref = jnp.take_along_axis(src, idx, axis=0)
    err = float(jnp.max(jnp.abs(y - ref)))
    t = timeit(lambda i, s: call(i, s), idx, src)
    t_xla = timeit(lambda i, s: jnp.take_along_axis(s, i, axis=0), idx, src)
    n_el = n_src * width
    print(
        f"same-shape gather [{n_src}, {width}]: pallas {t:7.3f} ms "
        f"({t / n_el * 1e6:.2f} ns/elem)  xla {t_xla:7.3f} ms  maxerr {err:.1e}"
    )


def main():
    run_case(1024, 128)
    run_case(8192, 128)
    run_case(8192, 8)


if __name__ == "__main__":
    main()
