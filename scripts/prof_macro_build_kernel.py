"""Prototype a Pallas-fused macro build (ops/macroblock.py
build_macro_values) that keeps the 1.1 GB placement intermediate A in
VMEM instead of round-tripping HBM.

Questions answered empirically:

  0. Mosaic MXU rate: does a kernel dot engage the full TensorCore
     (v5e: 4 MXUs, ~98 T MAC/s bf16) or a single MXU (~25 T)?  The fused
     build moves ~150 G useful MACs (3 exact passes); single-MXU issue
     rates would leave it at or above the XLA build's 21.4 ms.
  1. Fused kernel, per-cell dots: 20 cells x 3 splits tiny [16,16]x
     [16,128] dots per block + 3 K=320 stage-2 dots.
  2. Fused kernel, block-diagonal: stage 1 as ONE [320,320]x[320,128]
     dot per split (20x MAC waste, 12 dot issues per block).

Exactness: one-hot operands are exact under the MXU's f32->bf16 operand
truncation; the F side is split into three exactly-bf16-valued f32 parts
(hi/lo/lolo covers the f32 mantissa), so stage 1 places exact values and
stage 2 sums them in f32 -- same error class as the XLA HIGHEST build
(equality-checked below).

Usage: python scripts/prof_macro_build_kernel.py [lc] [nz]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from navierstokes_project_nm4pde_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from navierstokes_project_nm4pde_tpu.ops.macroblock import build_macro_values

REPS = 10
DN = (((0,), (0,)), ((), ()))


def timeit(f, x, *consts, reps=REPS):
    """Chained-loop timing (per-dispatch timing lies through the tunnel):
    f(x, *consts) -> array; the loop re-perturbs x from the output."""

    def prog(x, *consts):
        def body(_, xv):
            out = f(xv, *consts)
            return x * (1.0 + 1e-30 * jnp.max(jnp.abs(out)))

        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

    g = jax.jit(prog)
    float(g(x, *consts))
    float(g(x, *consts))
    t0 = time.perf_counter()
    float(g(x, *consts))
    return (time.perf_counter() - t0) / reps * 1e3


# ----------------------------------------------------------------------
# 0. raw Mosaic dot rate
# ----------------------------------------------------------------------
def probe_mxu_rate():
    N = 2048

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], DN, preferred_element_type=jnp.float32
        )

    def run(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        )(a, b)

    a = jnp.ones((N, N), jnp.float32)
    macs = N * N * N
    t = timeit(run, a, a, reps=100)
    print(f"mosaic dot [{N}^3] f32-ops: {t:6.3f} ms = "
          f"{macs / t / 1e9:.1f} T MAC/s")

    ab = a.astype(jnp.bfloat16)
    t2 = timeit(
        lambda x, y: jax.lax.dot_general(
            x, y, DN, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16),
        ab, ab, reps=100,
    )
    print(f"xla dot    [{N}^3] bf16   : {t2:6.3f} ms = "
          f"{macs / t2 / 1e9:.1f} T MAC/s")


# ----------------------------------------------------------------------
# shared: pad/flatten inputs for the fused kernels
# ----------------------------------------------------------------------
def prep(F_e, onehot, B, c, U):
    """onehot [B, c, nloc, U] bf16 -> P [B, c*16, U] bf16 (zero-padded);
    F_e [E, nloc, nloc] -> F [B, c*16, 16] f32 (zero-padded)."""
    nloc = F_e.shape[1]
    P = jnp.pad(onehot, ((0, 0), (0, 0), (0, 16 - nloc), (0, 0)))
    P = P.reshape(B, c * 16, U)
    pad = B * c - F_e.shape[0]
    Fp = jnp.pad(F_e, ((0, pad), (0, 16 - nloc), (0, 16 - nloc)))
    Fp = Fp.reshape(B, c * 16, 16)
    return P, Fp


def _split3(F):
    h = F.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (F - h).astype(jnp.bfloat16).astype(jnp.float32)
    ll = (F - h - lo).astype(jnp.bfloat16).astype(jnp.float32)
    return h, lo, ll


# ----------------------------------------------------------------------
# 1. fused kernel, per-cell dots
# ----------------------------------------------------------------------
def _kern_cells(p_ref, f_ref, o_ref, *, c, U, nb):
    for b in range(nb):
        Pf = p_ref[b].astype(jnp.float32)  # [c*16, U]
        F = f_ref[b]  # [c*16, 16] f32
        acc = jnp.zeros((U, U), jnp.float32)
        for Fk in _split3(F):
            rows = []
            for cc in range(c):
                Fc = Fk[cc * 16:(cc + 1) * 16, :]  # [16(i), 16(j)]
                Pc = Pf[cc * 16:(cc + 1) * 16, :]  # [16(i), U]
                rows.append(
                    jax.lax.dot_general(
                        Fc, Pc, DN, preferred_element_type=jnp.float32
                    )
                )  # [16(j), U]
            A = jnp.concatenate(rows, axis=0)  # [c*16, U]
            acc = acc + jax.lax.dot_general(
                A, Pf, DN, preferred_element_type=jnp.float32
            )
        o_ref[b] = acc


# ----------------------------------------------------------------------
# 2. fused kernel, block-diagonal stage 1
# ----------------------------------------------------------------------
def _kern_bd(p_ref, f_ref, o_ref, *, c, U, nb):
    n = c * 16
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // 16
    cj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // 16
    mask = (ci == cj).astype(jnp.float32)
    for b in range(nb):
        Pf = p_ref[b].astype(jnp.float32)  # [n, U]
        F = f_ref[b]  # [n, 16]
        acc = jnp.zeros((U, U), jnp.float32)
        for Fk in _split3(F):
            Fbd = jnp.concatenate([Fk] * c, axis=1) * mask  # [n, n]
            A = jax.lax.dot_general(
                Fbd, Pf, DN, preferred_element_type=jnp.float32
            )  # [n=(c,j), U]
            acc = acc + jax.lax.dot_general(
                A, Pf, DN, preferred_element_type=jnp.float32
            )
        o_ref[b] = acc


# ----------------------------------------------------------------------
# 3. fused kernels with bf16 MXU operands (full-rate dots)
# ----------------------------------------------------------------------
def _split3_b(F):
    """Exact 3-way bf16 split (bf16 outputs -- full-rate MXU operands)."""
    h = F.astype(jnp.bfloat16)
    r1 = F - h.astype(jnp.float32)
    m = r1.astype(jnp.bfloat16)
    lo = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, lo


def _kern_cells16(p_ref, f_ref, o_ref, *, c, U, nb):
    # Mosaic requires 32-bit matmul accumulators: stage-1 dots emit f32 and
    # cast to bf16 (exact -- each output is a single placed split value).
    for b in range(nb):
        Pf = p_ref[b]  # [c*16, U] bf16
        F = f_ref[b]  # [c*16, 16] f32
        acc = jnp.zeros((U, U), jnp.float32)
        for Fk in _split3_b(F):
            rows = []
            for cc in range(c):
                Fc = Fk[cc * 16:(cc + 1) * 16, :]
                Pc = Pf[cc * 16:(cc + 1) * 16, :]
                rows.append(
                    jax.lax.dot_general(
                        Fc, Pc, DN, preferred_element_type=jnp.float32
                    )
                )  # [16(j), U] exact single values
            A = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                A, Pf, DN, preferred_element_type=jnp.float32
            )
        o_ref[b] = acc


def _kern_bd16(p_ref, f_ref, o_ref, *, c, U, nb):
    n = c * 16
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // 16
    cj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // 16
    mask = (ci == cj).astype(jnp.bfloat16)
    for b in range(nb):
        Pf = p_ref[b]  # [n, U] bf16
        F = f_ref[b]  # [n, 16] f32
        acc = jnp.zeros((U, U), jnp.float32)
        for Fk in _split3_b(F):
            Fbd = jnp.concatenate([Fk] * c, axis=1) * mask  # [n, n] bf16
            A = jax.lax.dot_general(
                Fbd, Pf, DN, preferred_element_type=jnp.float32
            )  # [n=(c,j), U] exact single values
            acc = acc + jax.lax.dot_general(
                A.astype(jnp.bfloat16), Pf, DN,
                preferred_element_type=jnp.float32,
            )
        o_ref[b] = acc


def run_fused(kern, P, Fp, B, c, U, nb=1):
    return pl.pallas_call(
        functools.partial(kern, c=c, U=U, nb=nb),
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, c * 16, U), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, c * 16, 16), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, U, U), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, U, U), jnp.float32),
    )(P, Fp)


# ----------------------------------------------------------------------
def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 14

    probe_mxu_rate()

    from prof_macro_apply import load_or_build

    from navierstokes_project_nm4pde_tpu.ops.macroblock import (
        build_macro_plan,
    )

    cells_u, n_unodes, _nv = load_or_build(lc, nz)
    t0 = time.time()
    mp = build_macro_plan(cells_u, n_unodes)
    B, c, U = mp.B, mp.c_blk, mp.U
    E, nloc = cells_u.shape
    print(f"# B={B} c={c} U={U} E={E}; plan {time.time() - t0:.0f}s")

    rng = np.random.default_rng(0)
    F_e = jnp.asarray(rng.normal(size=(E, nloc, nloc)), jnp.float32)

    ref = jax.jit(build_macro_values)(mp, F_e)
    t_ref = timeit(lambda f, m: build_macro_values(m, f), F_e, mp)
    print(f"xla build HIGHEST       : {t_ref:7.2f} ms")

    from navierstokes_project_nm4pde_tpu.ops.macroblock import (
        build_macro_values_split3,
    )

    out3 = jax.jit(build_macro_values_split3)(mp, F_e)
    err3 = float(jnp.linalg.norm(out3 - ref) / jnp.linalg.norm(ref))
    t3 = timeit(lambda f, m: build_macro_values_split3(m, f), F_e, mp)
    print(f"xla build split3        : {t3:7.2f} ms  rel err {err3:.1e}")

    t_prep = timeit(
        lambda f, oh: prep(f, oh, B, c, U)[1][0, 0, 0], F_e, mp.onehot
    )
    print(f"input pad/flatten       : {t_prep:7.2f} ms")

    P, Fp = jax.jit(lambda f, oh: prep(f, oh, B, c, U))(F_e, mp.onehot)
    for name, kern, nb in (
        ("cells", _kern_cells, 1),
        ("bd", _kern_bd, 1),
        ("cells16", _kern_cells16, 1),
        ("bd16", _kern_bd16, 1),
        ("cells16x4", _kern_cells16, 4),
        ("bd16x4", _kern_bd16, 4),
    ):
        try:
            out = jax.jit(
                lambda Fp, P, k=kern, nb=nb: run_fused(k, P, Fp, B, c, U, nb)
            )(Fp, P)
            err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
            t = timeit(
                lambda Fp, P, k=kern, nb=nb: run_fused(k, P, Fp, B, c, U, nb),
                Fp, P,
            )
            print(f"fused {name:5s}             : {t:7.2f} ms"
                  f"  rel err {err:.1e}")
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            print(f"fused {name:5s}             : FAILED {msg[:240]}")


if __name__ == "__main__":
    main()
