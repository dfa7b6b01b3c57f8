"""Macro-element block-dense form of the per-step velocity operator F.

The F solve is ~58% of the projection step and its matrix-free apply is
issue-rate bound: the element gather + node reduce move one 12 B row per
cell-node SLOT (~2.2M each way at 965k DoF) and the TPU gathers ~1 row
per cycle -- the Pallas panel-gather alternative is infeasible (Mosaic
has no within-VMEM row indexer; scripts/prof_pallas_gather.py).  This
module cuts the ROW COUNT instead of the row rate:

  * cells (already RCM-sorted) are grouped into fixed-size macro blocks
    of `c_blk` consecutive cells whose UNIQUE node count fits in U=128
    (measured on the 965k bench mesh: c_blk=20 -> max 125 unique, mean
    80, overlap beta = 2.83 block-slots per node);
  * each block's dense [U, U] operator Ft_b is assembled ON DEVICE per
    step from the folded per-element matrices F_e (component-scalar
    [E, 10, 10]) by two one-hot MXU contractions -- assembly WITHOUT a
    scatter, at ~40 G MACs for the whole 965k operator;
  * the apply is then: one [B, U]-row gather (beta*n ~ 0.9M rows instead
    of 2.2M slots), one batched dense matvec over the 128-lane-exact
    [B, U, U] value stream, and one valence-bucketed reduce of beta
    contributions per node (ops/scatter.py machinery).

F~ is EXACTLY the assembled F (same values, different summation order):
the step's Krylov operator stays the reference's semi-implicit
linearisation (ref: src/NavierStokes2D.cpp:253), equality-tested against
apply_F to fp tolerance.  One-hot operands are exact in bfloat16, so the
MXU assembly runs the one-hot side single-pass while the F_e side keeps
f32 fidelity under precision="highest".
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MacroPlan:
    """Static block structure (values are rebuilt per step)."""

    uidx: jax.Array  # [B, U] int32 global node per block slot (pad -> n)
    onehot: jax.Array  # [B, c_blk, nloc, U] bf16 one-hot of local slots
    plan: object  # GatherPlan: flat [B*U] block-slot contribs -> [n]
    # Two-level (windowed) form of the slot gather: block rows are RCM-
    # ordered so each chunk's nodes live in small vertex/edge windows --
    # the gather rate is SOURCE-working-set bound (~3x the plain rate at
    # 965k).  Pad slots are remapped to the block's first node (their Ft
    # rows/columns are zero, so the gathered value is never consumed).
    wgather: object | None
    n: int = dataclasses.field(metadata=dict(static=True))
    B: int = dataclasses.field(metadata=dict(static=True))
    U: int = dataclasses.field(metadata=dict(static=True))
    c_blk: int = dataclasses.field(metadata=dict(static=True))
    E: int = dataclasses.field(metadata=dict(static=True))  # real cells


def build_macro_plan(
    cells_u: np.ndarray, n_unodes: int, U: int = 128, c_blk: int = 20,
    n_vertices: int | None = None,
) -> MacroPlan:
    """Group RCM-consecutive cells into blocks of `c_blk` with <= U unique
    nodes each (c_blk auto-shrinks if any block overflows).  Pass
    `n_vertices` (the P2 vertex/edge numbering split) to enable the
    windowed two-level slot gather."""
    from navierstokes_project_nm4pde_tpu.ops.scatter import (
        build_gather_plan_grouped,
        build_windowed_gather,
    )

    cells = np.asarray(cells_u, dtype=np.int64)
    E, nloc = cells.shape
    while c_blk > 1:
        B = -(-E // c_blk)
        pad = B * c_blk - E
        cp = np.concatenate(
            [cells, np.full((pad, nloc), cells[0, 0], np.int64)], axis=0
        ).reshape(B, c_blk, nloc)
        uidx = np.full((B, U), n_unodes, np.int64)
        lidx = np.empty((B, c_blk, nloc), np.int64)
        ok = True
        for b in range(B):
            uniq, inv = np.unique(cp[b], return_inverse=True)
            if len(uniq) > U:
                ok = False
                break
            uidx[b, : len(uniq)] = uniq
            lidx[b] = inv.reshape(c_blk, nloc)
        if ok:
            break
        c_blk -= 2
    else:
        raise ValueError("macro blocks cannot satisfy U even at c_blk=2")

    # One-hot materialised ON DEVICE (557 MB at 965k -- the host->device
    # tunnel is the scarce resource; only the 2 MB slot table ships).
    # int8 covers local slots 0..127 exactly at U=128; wider blocks need
    # int16 (int8 would silently wrap above 127).
    idt = jnp.int8 if U <= 128 else jnp.int16
    lidx8 = jnp.asarray(lidx, idt)
    valid = np.ones((B, c_blk), np.bool_)
    if pad:
        valid.reshape(-1)[E:] = False
    onehot = (
        (lidx8[..., None] == jnp.arange(U, dtype=idt))
        & jnp.asarray(valid)[:, :, None, None]
    ).astype(jnp.bfloat16)

    # Valence buckets tuned on the 965k bench mesh: block overlap beta is
    # small (most nodes appear in 1-4 blocks), so fine low-valence buckets
    # cut the K_max padding waste -- 8.45 -> 7.32 ms per reduce (1.07M ->
    # 898k gathered rows); even finer (..5..12) re-loses to per-bucket
    # fixed op costs (scripts/prof_macro_apply.py).
    plan = build_gather_plan_grouped(
        uidx.reshape(-1),
        n_unodes,
        thresholds=(1, 2, 3, 4, 6, 8),
        drop_row=n_unodes,
        mode="columns",
    )
    wgather = None
    if n_vertices is not None:
        ug = uidx.copy()
        padslots = ug == n_unodes
        ug[padslots] = np.broadcast_to(ug[:, :1], ug.shape)[padslots]
        wgather = build_windowed_gather(
            ug, n_vertices, n_unodes, cells_per_block=256, align=512
        )
        if wgather.window_rows > max(n_unodes // 4, 4096):
            wgather = None  # degenerate windows (unordered mesh)
    return MacroPlan(
        uidx=jnp.asarray(uidx, jnp.int32),
        onehot=jnp.asarray(onehot, jnp.bfloat16),
        plan=plan,
        wgather=wgather,
        n=n_unodes,
        B=B,
        U=U,
        c_blk=c_blk,
        E=E,
    )


def build_macro_values(
    mp: MacroPlan, F_e: jax.Array, layout: str = "uv",
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Per-step block-dense values Ft [B, U, U] from the folded
    per-element matrices F_e [E, nloc, nloc].

    Two one-hot contractions (no scatter): stage 1 places each element
    row at its block slot (each output is a SINGLE F_e value -- exact);
    stage 2 sums the <= c_blk per-(u, v) contributions in f32.  The
    one-hot operand is exact in bf16; precision="highest" keeps the F_e
    side at f32 fidelity.

    layout="vu" emits the TRANSPOSED values Ft[b, v, u] (contraction
    axis v in sublanes) consumed by the VPU matvec kernel below -- same
    build cost, just the output einsum order."""
    B, c, U = mp.B, mp.c_blk, mp.U
    nloc = F_e.shape[1]
    pad = B * c - F_e.shape[0]
    F_ep = jnp.concatenate(
        [F_e, jnp.zeros((pad, nloc, nloc), F_e.dtype)], axis=0
    ).reshape(B, c, nloc, nloc)
    P = mp.onehot.astype(F_e.dtype)
    # Intermediate laid out [B, c, nloc, U]: the U axis MUST be minor (an
    # [.., U, nloc] order puts nloc=10 in the lane dim and the (8, 128)
    # tile pads the buffer 12.8x -- measured as a 14 GB intermediate).
    A = jnp.einsum("bciu,bcij->bcju", P, F_ep, precision=precision)
    out = "bvu" if layout == "vu" else "buv"
    return jnp.einsum(f"bcju,bcjv->{out}", A, P, precision=precision)


def _split3_bf16(F: jax.Array):
    """3-way bf16 split of an f32 array: F ~= hi + mid + lo with each part
    exactly representable in bfloat16 (8+8+8 mantissa bits cover f32's 24
    up to alignment tails ~1e-8 relative).  Lets matmuls against an
    EXACT-bf16 operand (the one-hot tables) run in 3 native MXU passes
    instead of HIGHEST's 6-pass emulation, with the same error class
    (products exact, sums in f32).

    MUST use lax.reduce_precision, not astype round-trips: this backend
    pins --xla_allow_excess_precision=true, under which XLA elides
    f32->bf16->f32 cast pairs -- the astype form silently degenerates to
    (hi=F, mid=lo=0), i.e. a plain bf16 truncation of the operand
    (measured rel err 1.7e-3, the known stepper-destabilising class)."""
    hi = jax.lax.reduce_precision(F, 8, 7)
    r1 = F - hi
    mid = jax.lax.reduce_precision(r1, 8, 7)
    lo = jax.lax.reduce_precision(r1 - mid, 8, 7)
    return (
        hi.astype(jnp.bfloat16),
        mid.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


def build_macro_values_split3(
    mp: MacroPlan, F_e: jax.Array, layout: str = "uv"
) -> jax.Array:
    """Exact-split build: same values as build_macro_values (to f32
    summation order), ~half the HBM traffic.

    The HIGHEST build is bandwidth-bound on the 6-pass bf16x6 emulation
    re-streaming both GEMM operands per pass.  Here the F_e side is split
    into three exactly-bf16 parts (hi/mid/lo covering the f32 mantissa);
    stage 1 places each part against the exact-bf16 one-hot (every output
    is a SINGLE split value -- exact in bf16), stage 2 contracts the bf16
    pair at native MXU rate accumulating f32.  Summing the three f32
    partials reconstructs the HIGHEST-precision result (equality-tested in
    tests/test_macro.py)."""
    B, c, U = mp.B, mp.c_blk, mp.U
    nloc = F_e.shape[1]
    pad = B * c - F_e.shape[0]
    F_ep = jnp.concatenate(
        [F_e, jnp.zeros((pad, nloc, nloc), F_e.dtype)], axis=0
    ).reshape(B, c, nloc, nloc)
    P = mp.onehot  # bf16, exact
    out = "bvu" if layout == "vu" else "buv"
    acc = None
    for Fk in _split3_bf16(F_ep):
        # stage 1: exact placement -- each output is one split value, so
        # the bf16 result is exact; accumulate type only guards the sum
        # of the (disjoint) one-hot terms.
        Ak = jnp.einsum(
            "bciu,bcij->bcju", P, Fk, preferred_element_type=jnp.bfloat16
        )
        part = jnp.einsum(
            "bcju,bcjv->" + out, Ak, P, preferred_element_type=jnp.float32
        )
        acc = part if acc is None else acc + part
    return acc


def macro_build_fn(kind: str):
    """Resolve the configured macro value-assembly engine
    (NumericsConfig.macro_build / macro_conv_build)."""
    if kind == "auto":
        kind = "highest"  # measured: split3 37.1 ms vs highest 21.25
    if kind == "split3":
        return build_macro_values_split3
    if kind == "highest":
        return build_macro_values
    if kind == "default":
        # Native-rate MXU (bf16 operands): 13.4 vs 21.4 ms at 965k but
        # 1.7e-3 value error -- valid ONLY for the convection-only part
        # under the K/C split, where the error lands on C's ~1/30 share
        # of F (the constant mass/stiffness blocks stay exact).
        return functools.partial(
            build_macro_values, precision=jax.lax.Precision.DEFAULT
        )
    raise ValueError(f"unknown macro_build: {kind}")


def _mv_kernel(ftT_ref, ub_ref, out_ref, *, nb, C):
    """Per-grid-step block matvec on the VPU (no MXU, no precision
    emulation): out[i, c, :] = sum_v ftT[i, v, :] * ub[i, v, c].

    ftT keeps the contraction axis v in SUBLANES so the reduction is the
    cheap cross-sublane one and the Ft value stream is read exactly once
    for all C channels -- the MXU form pads the 3-column operand to 128
    lanes and pays the 6-pass HIGHEST emulation on 128^3 blocks (measured
    54 GB/s effective at 965k; this kernel is bandwidth-shaped)."""
    for i in range(nb):
        ft = ftT_ref[i]  # [V, U] f32, v in sublanes
        cols = []
        for c in range(C):
            prod = ft * ub_ref[i, :, c : c + 1]  # [V, U] * [V, 1]
            cols.append(jnp.sum(prod, axis=0, keepdims=True))  # [1, U]
        out_ref[i] = jnp.concatenate(cols, axis=0)  # [C, U]


def macro_matvec_vpu(FtT: jax.Array, u_b: jax.Array, nb: int = 8):
    """y_b[b, u, c] = sum_v FtT[b, v, u] * u_b[b, v, c] via the Pallas
    VPU kernel; returns [B, U, C]."""
    B, V, U = FtT.shape
    C = u_b.shape[-1]
    grid = -(-B // nb)
    yT = pl.pallas_call(
        functools.partial(_mv_kernel, nb=nb, C=C),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nb, V, U), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, V, C), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, C, U), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, U), FtT.dtype),
        interpret=_interpret(),
    )(FtT, u_b)
    return jnp.swapaxes(yT, 1, 2)


def apply_macro_t(mp: MacroPlan, FtT: jax.Array, u: jax.Array) -> jax.Array:
    """y = F u via the TRANSPOSED block values (layout="vu") and the VPU
    matvec kernel: [n, C] -> [n, C].  Exactly the same summation values
    as apply_macro -- only the matvec engine differs."""
    from navierstokes_project_nm4pde_tpu.ops.scatter import apply_gather_plan

    C = u.shape[1]
    u_b = slot_gather(mp, u)  # [B, V, C]
    y_b = macro_matvec_vpu(FtT, u_b)
    return apply_gather_plan(mp.plan, y_b.reshape(mp.B * mp.U, C))


def slot_gather(mp: MacroPlan, x: jax.Array) -> jax.Array:
    """[n, C] -> [B, U, C] block-slot view (windowed when available)."""
    from navierstokes_project_nm4pde_tpu.ops.scatter import (
        apply_windowed_gather,
    )

    if mp.wgather is not None:
        return apply_windowed_gather(mp.wgather, x)
    xb = jnp.concatenate(
        [x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0
    )
    return xb[mp.uidx]


def slot_expand_elem(mp: MacroPlan, x_b: jax.Array) -> jax.Array:
    """[B, U, C] slot view -> [E, nloc, C] element view via the one-hot
    placement tables -- the forward element gather without the gather.

    The 2.2M-row forward gather of a node field is row-rate bound (~10 ms
    at 965k even windowed); when the field is ALREADY in the macro slot
    view (riding the step's one slot gather), each element-local value is
    a one-hot selection from its block's U-slot panel, so the expansion
    runs as ONE einsum streaming the placement tables at native bf16 MXU
    rate (~1.5 ms: 556 MB of one-hot + a 26 MB transpose at 965k).

    Exact for f32 inputs: the channel payload is 3-way bf16 split
    (hi/mid/lo, each exactly representable -- _split3_bf16) riding as
    extra channels through the same einsum; every output is a SINGLE
    split value (one-hot row), so the bf16 products are exact and the
    f32 recombination hi+mid+lo restores the input bits (the parts'
    mantissas do not overlap).  Equality-tested against gather_u in
    tests/test_macro.py."""
    B, c, nloc, U = mp.onehot.shape
    C = x_b.shape[-1]
    P = mp.onehot.reshape(B, c * nloc, U)
    if x_b.dtype == jnp.float32:
        hi, mid, lo = _split3_bf16(x_b)
        xs = jnp.concatenate([hi, mid, lo], axis=-1)  # [B, U, 3C] bf16
        y = jnp.einsum(
            "bpu,buk->bkp", P, xs, preferred_element_type=jnp.float32
        )
        y = y[:, :C] + y[:, C:2 * C] + y[:, 2 * C:]
    else:
        y = jnp.einsum(
            "bpu,buk->bkp", P.astype(x_b.dtype), x_b,
            precision=jax.lax.Precision.HIGHEST,
        )
    y = jnp.moveaxis(y, 1, 2).reshape(B * c, nloc, C)
    return y[: mp.E]


def apply_rhs_and_r0_macro(
    mp: MacroPlan, Mt: jax.Array, Ft: jax.Array, hist: jax.Array,
    u0: jax.Array, extra: jax.Array | None = None,
    x_b: jax.Array | None = None,
):
    """(M hist, F u0[, F extra]) in ONE slot gather + ONE wide reduce.

    The macro counterpart of ops.apply_rhs_and_r0's element pass (the
    projection momentum rhs b = M hist - G p and warm-start residual
    r0 = b - F u0; the G p term and Dirichlet masking stay at the call
    site): the per-step macro values Ft already encode F exactly and `Mt`
    is the setup-time macro form of the constant velocity mass, so both
    products ride the SAME beta*n-row slot gather and node reduce -- both
    row-rate-bound phases are paid once for the two operators, and the
    element pass (gather + quadrature contractions + reduce over 2.2M
    slot rows) is retired.  Exactly M hist / F u0 up to summation order
    (equality-tested in tests/test_macro.py).

    `extra` [n, m] rides additional channels through the SAME gather,
    Ft matvec, and reduce: both phases are row-rate bound, so fresh
    exact images F extra for the velocity warm-start pool
    (cfg.precond.f_warmstart) cost ~nothing on top of the pass.

    `x_b` short-circuits the slot gather with a PRE-GATHERED slot view
    (channels [hist | u0 | extra...]) -- the step's fused up-front gather
    (models/base.py) shares one beta*n-row gather between this pass and
    the convection fold's element view.
    Ref: the rhs rebuild in src/NavierStokes2D.cpp:414-488."""
    from navierstokes_project_nm4pde_tpu.ops.scatter import apply_gather_plan

    d = hist.shape[1]
    if x_b is None:
        xs = [hist, u0] if extra is None else [hist, u0, extra]
        x_b = slot_gather(mp, jnp.concatenate(xs, axis=1))
    y_b = jnp.concatenate(
        [
            jnp.einsum(
                "buv,bvc->buc", Mt, x_b[..., :d],
                precision=jax.lax.Precision.HIGHEST,
            ),
            jnp.einsum(
                "buv,bvc->buc", Ft, x_b[..., d:],
                precision=jax.lax.Precision.HIGHEST,
            ),
        ],
        axis=-1,
    )
    y = apply_gather_plan(mp.plan, y_b.reshape(mp.B * mp.U, x_b.shape[-1]))
    if extra is None:
        return y[:, :d], y[:, d:]
    return y[:, :d], y[:, d:2 * d], y[:, 2 * d:]


def split3_values(Ft: jax.Array):
    """3-way exact-bf16 split (hi, mid, lo) of block values, computed once
    per step (or at setup for constant blocks) so every apply can stream
    native bf16 parts instead of re-streaming the f32 array through the
    HIGHEST emulation's passes."""
    return _split3_bf16(Ft)


def apply_macro_split3(mp: MacroPlan, Ft3, u: jax.Array) -> jax.Array:
    """y = F u from PRE-SPLIT bf16 value parts: the HIGHEST-precision
    macro matvec without re-streaming the 712 MB f32 value array.

    The HIGHEST einsum emulates f32 with 6 bf16 product passes, each
    re-reading the value operand -- at bench scale that is ~4.3 GB of
    HBM per apply and the measured apply is stream-bound.  Here the
    values are split ONCE into exactly-bf16 (hi, mid, lo) parts
    (split3_values; half the bytes each) and the u-side parts ride as
    channels, so the six significance products (hh, hm, hl, mh, mm, lh
    -- the same set the emulation keeps) cost ONE stream of each part:
    ~1.1 GB.  Products of exact-bf16 operands accumulate in f32; the
    error class equals the split3 build's (~1e-8 relative vs HIGHEST,
    equality-tested in tests/test_macro.py)."""
    from navierstokes_project_nm4pde_tpu.ops.scatter import apply_gather_plan

    C = u.shape[1]
    u_b = slot_gather(mp, u)  # [B, U, C] f32
    uh, um, ul = _split3_bf16(u_b)
    U3 = jnp.concatenate([uh, um, ul], axis=-1)  # [B, U, 3C] bf16
    fh, fm, fl = Ft3
    f32 = jnp.float32
    Yh = jnp.einsum("buv,bvc->buc", fh, U3, preferred_element_type=f32)
    Ym = jnp.einsum(
        "buv,bvc->buc", fm, U3[..., : 2 * C], preferred_element_type=f32
    )
    Yl = jnp.einsum(
        "buv,bvc->buc", fl, U3[..., :C], preferred_element_type=f32
    )
    y = (
        (Yh[..., :C] + (Yh[..., C:2 * C] + Ym[..., :C]))
        + (Yh[..., 2 * C:] + (Ym[..., C:] + Yl))
    )
    return apply_gather_plan(mp.plan, y.reshape(mp.B * mp.U, C))


def apply_macro(mp: MacroPlan, Ft: jax.Array, u: jax.Array) -> jax.Array:
    """y = F u via the block-dense values: [n, C] -> [n, C]."""
    from navierstokes_project_nm4pde_tpu.ops.scatter import apply_gather_plan

    C = u.shape[1]
    u_b = slot_gather(mp, u)  # [B, U, C] -- beta*n rows, not slot rows
    # MXU batched matvec at HIGHEST precision (the validated bf16x6
    # emulation): measured 13.1 ms vs 15.5-16.9 for the channel-planar
    # VPU fold at 965k -- the VPU form re-streams the 712 MB value array
    # per channel, the MXU expands operand tiles in VMEM and streams Ft
    # once (scripts/prof_macro.py).
    y_b = jnp.einsum(
        "buv,bvc->buc", Ft, u_b, precision=jax.lax.Precision.HIGHEST
    )
    return apply_gather_plan(mp.plan, y_b.reshape(mp.B * mp.U, C))
