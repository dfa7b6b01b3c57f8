"""Windowed one-hot MXU gather/reduce Pallas kernels (ensemble fast path).

XLA lowers unstructured gathers on this TPU backend to ~3 GB/s row traffic
(PERFORMANCE.md) -- the hard floor of single-run operator applications, and
a catastrophic one for vmapped ensembles whose gather bytes scale with the
batch size.  These kernels re-express both assembly data movements

    gather:  y_e[s, :] = x[cells_flat[s], :]          (DoF gather)
    reduce:  out[n, :] = sum_{s: cells_flat[s]=n} y_e[s, :]   (scatter-add)

as dense one-hot matmuls against *contiguous node/slot windows* that are
DMA'd into VMEM at full HBM bandwidth:

    out_block = onehot(local_indices) @ window        (MXU)

The contraction runs on the 128x128 MXU, so it is efficient exactly when the
payload row is wide -- i.e. for ensemble runs where the batch axis is packed
last and C = B * dim >= 128 lanes.  (For single runs with C = dim the MXU
padding burns the win; the XLA gather-sum plans in ops/scatter.py remain the
single-run path.  This split is measured, not assumed: see PERFORMANCE.md.)

The windows only stay narrow under a bandwidth-minimising cell order:
build plans from a mesh reordered with `Mesh.reorder_spatial("rcm")`
(mesh/core.py).  Under Morton order the per-node cell spans are heavy-tailed
and the windows degenerate to a large fraction of the mesh.

Replaces (for ensembles) the role of the reference's Trilinos distributed
matrix/vector gather + compress() reduction (ref: src/NavierStokes2D.cpp:
307-320) -- here a pure device-side dense contraction.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend (absent on pure-CPU installs)
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ----------------------------------------------------------------------
# Plans (host-built, static)
# ----------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OneHotGatherPlan:
    """Per-cell-block windowed gather:  out[b*S+s] = x[win(b)[li[b, s]]].

    Each block's referenced nodes live in two contiguous index windows
    (vertex ids and edge ids are numbered into disjoint contiguous regions,
    fem/space.py), DMA'd to VMEM and indexed by a one-hot matmul."""

    li: jax.Array  # [B, S//SC, SC] int32 into concat(vwin, ewin), -1 = pad
    vstart: jax.Array  # [B] int32 (8-aligned)
    estart: jax.Array  # [B] int32 (8-aligned)
    VW: int = dataclasses.field(metadata=dict(static=True))
    EW: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))  # slots per block
    SC: int = dataclasses.field(metadata=dict(static=True))  # slot chunk | S
    n_slots: int = dataclasses.field(metadata=dict(static=True))
    n_rows_pad: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OneHotReducePlan:
    """Per-node-block windowed segment reduction over one node region.

    Block b owns rows [row0 + b*NB, row0 + (b+1)*NB).  All slots that
    target a row of the block lie in one contiguous slot window (bounded by
    the RCM bandwidth); slots in the window targeting foreign rows carry
    label -1 and drop out of the one-hot."""

    lab: jax.Array  # [B, W_max//WC, WC] int32: row - block_row_base, else -1
    win_start: jax.Array  # [B] int32 (8-aligned)
    n_chunks: jax.Array  # [B] int32 (window chunks of WC actually needed)
    row0: int = dataclasses.field(metadata=dict(static=True))
    NB: int = dataclasses.field(metadata=dict(static=True))
    W_max: int = dataclasses.field(metadata=dict(static=True))
    WC: int = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))  # region rows
    n_slots_pad: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OneHotPlans:
    gather: OneHotGatherPlan
    reduce_v: OneHotReducePlan
    reduce_e: OneHotReducePlan
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_slots: int = dataclasses.field(metadata=dict(static=True))


def build_onehot_plans(
    cells_u: np.ndarray,
    n_vnodes: int,
    n_rows: int,
    cells_per_block: int = 512,
    nb_vertex: int = 128,
    nb_edge: int = 512,
    window_chunk: int = 2048,
) -> OneHotPlans:
    """Build gather/reduce plans.  `cells_u` must come from an RCM-ordered
    mesh; vertex node ids < n_vnodes, edge ids >= n_vnodes (P2 contract)."""
    cells_u = np.asarray(cells_u, dtype=np.int64)
    E, nloc = cells_u.shape
    # vertex-local columns first: P2 tri = 3 vertices + 3 edges,
    # P2 tet = 4 vertices + 6 edges (fem/reference.py node ordering contract)
    n_vloc = 3 if nloc == 6 else 4

    # ---------------- gather plan ----------------
    CB = cells_per_block
    B = -(-E // CB)
    E_pad = B * CB
    S = CB * nloc
    vpart = cells_u[:, :n_vloc]
    epart = cells_u[:, n_vloc:]
    vstart = np.zeros(B, np.int64)
    estart = np.zeros(B, np.int64)
    VW = EW = 0
    for b in range(B):
        sl = slice(b * CB, min((b + 1) * CB, E))
        vs = (vpart[sl].min() // 8) * 8
        es = (epart[sl].min() // 8) * 8
        vstart[b], estart[b] = vs, es
        VW = max(VW, int(vpart[sl].max()) + 1 - vs)
        EW = max(EW, int(epart[sl].max()) + 1 - es)
    VW = _round_up(VW, 8)
    # round the edge window to the matmul chunk so the scratch DMA stays
    # inside the padded x (chunks past the real window hit only dead lanes)
    EW = _round_up(EW, 1024) if EW > 1024 else _round_up(EW, 8)
    li = np.full((B, CB, nloc), -1, np.int64)
    for b in range(B):
        sl = slice(b * CB, min((b + 1) * CB, E))
        n = sl.stop - sl.start
        li[b, :n, :n_vloc] = vpart[sl] - vstart[b]
        li[b, :n, n_vloc:] = VW + (epart[sl] - estart[b])
    n_rows_pad = max(
        _round_up(n_rows, 8),
        int((vstart + VW).max()),
        int((estart + EW).max()),
    )
    cbc = min(CB, 64)
    while CB % cbc:
        cbc -= 1
    SC = cbc * nloc
    if SC % 128:
        raise ValueError(
            f"slot chunk {SC} must be lane-aligned; pick cells_per_block "
            f"so that (<=64-divisor of it) * nloc is a multiple of 128"
        )
    gplan = OneHotGatherPlan(
        li=jnp.asarray(li.reshape(B, S // SC, SC), jnp.int32),
        vstart=jnp.asarray(vstart, jnp.int32),
        estart=jnp.asarray(estart, jnp.int32),
        VW=VW,
        EW=EW,
        S=S,
        SC=SC,
        n_slots=E * nloc,
        n_rows_pad=n_rows_pad,
    )

    # ---------------- reduce plans ----------------
    flat = cells_u.reshape(-1)
    n_slots = flat.shape[0]
    first = np.full(n_rows, n_slots, np.int64)
    last = np.full(n_rows, -1, np.int64)
    pos = np.arange(n_slots)
    np.minimum.at(first, flat, pos)
    np.maximum.at(last, flat, pos)

    WC = window_chunk

    def region(row0, row1, NB):
        Bb = -(-(row1 - row0) // NB)
        ws = np.zeros(Bb, np.int64)
        nch = np.zeros(Bb, np.int64)
        W_max = 0
        for b in range(Bb):
            lo, hi = row0 + b * NB, min(row0 + (b + 1) * NB, row1)
            f = first[lo:hi]
            f = f[f < n_slots]
            if f.size == 0:  # rows with no slots (cannot happen for FEM)
                ws[b], nch[b] = 0, 0
                continue
            s0 = (int(f.min()) // 8) * 8
            s1 = int(last[lo:hi].max()) + 1
            ws[b] = s0
            nch[b] = -(-(s1 - s0) // WC)
            W_max = max(W_max, int(nch[b]) * WC)
        W_max = max(W_max, WC)
        lab = np.full((Bb, W_max), -1, np.int64)
        for b in range(Bb):
            lo = row0 + b * NB
            w0, w1 = int(ws[b]), min(int(ws[b]) + int(nch[b]) * WC, n_slots)
            t = flat[w0:w1] - lo
            t[(t < 0) | (t >= min(NB, row1 - lo))] = -1
            lab[b, : w1 - w0] = t
        lab = lab.reshape(Bb, W_max // WC, WC)
        n_slots_pad = max(
            _round_up(n_slots, 8), int((ws + nch * WC).max()) if Bb else 0
        )
        return OneHotReducePlan(
            lab=jnp.asarray(lab, jnp.int32),
            win_start=jnp.asarray(ws, jnp.int32),
            n_chunks=jnp.asarray(nch, jnp.int32),
            row0=row0,
            NB=NB,
            W_max=W_max,
            WC=WC,
            n_rows=row1 - row0,
            n_slots_pad=n_slots_pad,
        )

    return OneHotPlans(
        gather=gplan,
        reduce_v=region(0, n_vnodes, nb_vertex),
        reduce_e=region(n_vnodes, n_rows, nb_edge),
        n_rows=n_rows,
        n_slots=n_slots,
    )


# ----------------------------------------------------------------------
# Gather kernel
# ----------------------------------------------------------------------
def _gather_kernel(
    vstart_ref, estart_ref, li_ref, x_hbm, out_ref, vwin, ewin, sems, *, SC, EWC
):
    b = pl.program_id(0)
    S = out_ref.shape[0]
    VW = vwin.shape[0]
    EW = ewin.shape[0]
    C = out_ref.shape[1]
    dv = pltpu.make_async_copy(
        x_hbm.at[pl.ds(pl.multiple_of(vstart_ref[b], 8), VW)], vwin, sems.at[0]
    )
    de = pltpu.make_async_copy(
        x_hbm.at[pl.ds(pl.multiple_of(estart_ref[b], 8), EW)], ewin, sems.at[1]
    )
    dv.start()
    de.start()
    dv.wait()
    de.wait()
    cdt = vwin.dtype
    # one-hot built transposed [W, SC] (labels stay in lanes; no relayout),
    # contracted on dim 0 against the window: (W, SC)^T-free dot -> [SC, C]
    dn = (((0,), (0,)), ((), ()))
    for s0 in range(0, S, SC):
        lic = li_ref[0, s0 // SC, :][None, :]  # [1, SC] lanes
        iov = jax.lax.broadcasted_iota(jnp.int32, (VW, SC), 0)
        acc = jax.lax.dot_general(
            (lic == iov).astype(cdt), vwin[:], dn,
            preferred_element_type=jnp.float32,
        )
        for k in range(0, EW, EWC):
            ioe = (
                jax.lax.broadcasted_iota(jnp.int32, (EWC, SC), 0) + (VW + k)
            )
            acc = acc + jax.lax.dot_general(
                (lic == ioe).astype(cdt), ewin[k : k + EWC, :], dn,
                preferred_element_type=jnp.float32,
            )
        out_ref[s0 : s0 + SC, :] = acc.astype(out_ref.dtype)


def onehot_gather(plans: OneHotPlans, x: jax.Array) -> jax.Array:
    """y_e = x[cells_flat]  for payload x [n_rows, C] -> [n_slots, C].

    Like onehot_reduce, payloads wider than 128 lanes run as 128-lane
    chunks to bound the per-call VMEM windows."""
    g = plans.gather
    C0 = x.shape[1]
    C = _round_up(C0, 128)  # Mosaic DMA slices need 128-aligned lanes
    B = g.vstart.shape[0]
    pad = g.n_rows_pad - x.shape[0]
    xp = jnp.concatenate([x, jnp.zeros((pad, C0), x.dtype)], axis=0)
    if C != C0:
        xp = jnp.pad(xp, ((0, 0), (0, C - C0)))
    if C > 128:
        parts = [
            _onehot_gather_128(
                g, jax.lax.slice_in_dim(xp, c0, c0 + 128, axis=1)
            )
            for c0 in range(0, C, 128)
        ]
        return jnp.concatenate(parts, axis=1)[: g.n_slots, :C0]
    return _onehot_gather_128(g, xp)[: g.n_slots, :C0]


def _onehot_gather_128(g: OneHotGatherPlan, xp: jax.Array) -> jax.Array:
    C = xp.shape[1]
    B = g.vstart.shape[0]
    SC = g.SC
    EWC = min(g.EW, 1024)  # chunk the window matmul: iota/onehot temporaries
    # at [EWC, SC] are the dominant VMEM transients
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, g.S // g.SC, g.SC), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((g.S, C), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((g.VW, C), xp.dtype),
            pltpu.VMEM((_round_up(g.EW, EWC), C), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, SC=SC, EWC=EWC),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * g.S, C), xp.dtype),
        interpret=_interpret(),
    )(g.vstart, g.estart, g.li, xp)


# ----------------------------------------------------------------------
# Reduce kernel
# ----------------------------------------------------------------------
def _reduce_kernel(
    wstart_ref, nchunk_ref, lab_ref, y_hbm, out_ref, ybuf, sem, *, WC
):
    b = pl.program_id(0)
    NB = out_ref.shape[0]
    C = out_ref.shape[1]
    n_chunks = nchunk_ref[b]
    w0 = wstart_ref[b]
    cdt = ybuf.dtype

    def body(k, acc):
        cp = pltpu.make_async_copy(
            y_hbm.at[pl.ds(pl.multiple_of(w0 + k * WC, 8), WC)], ybuf, sem
        )
        cp.start()
        cp.wait()
        labc = lab_ref[0, k, :]  # [WC] lanes
        ior = jax.lax.broadcasted_iota(jnp.int32, (NB, WC), 0)
        oh = (labc[None, :] == ior).astype(cdt)
        return acc + jnp.dot(oh, ybuf[:], preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((NB, C), jnp.float32)
    )
    out_ref[:] = acc.astype(out_ref.dtype)


def _onehot_reduce_region(r, yp, C):
    B = r.win_start.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, r.W_max // r.WC, r.WC), lambda b, *_: (b, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r.NB, C), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((r.WC, C), yp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, WC=r.WC),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * r.NB, C), yp.dtype),
        interpret=_interpret(),
    )(r.win_start, r.n_chunks, r.lab, yp)
    return out[: r.n_rows]


def onehot_reduce(plans, y, precise=False):
    """out[n] = sum of y over slots with cells_flat = n;  y [n_slots, C].

    Payloads wider than 128 lanes are processed in 128-lane chunks (one
    pallas call each): a single call at C=256 (a 64-member 3D ensemble)
    overflows the 16 MB scoped-vmem budget of the reduce blocks.

    `precise` defeats the MXU's f32-operand-to-bf16 truncation (~1e-3
    relative, verified on-chip) by running the unchanged kernel TWICE on a
    hi/lo payload split: hi is exactly bf16-valued so its pass is exact;
    lo = y - hi retains up to 16 mantissa bits and is only truncated by a
    further ~2^-8 relative on its pass, giving ~2^-16 combined error.
    (Mosaic rejects bf16 dots inside the kernel, and interpret mode's
    full-f32 dot needs no split -- it is skipped there.)"""
    if precise and not _interpret():
        hi = y.astype(jnp.bfloat16).astype(y.dtype)
        lo = y - hi
        return onehot_reduce(plans, hi) + onehot_reduce(plans, lo)
    C0 = y.shape[1]
    C = _round_up(C0, 128)  # Mosaic DMA slices need 128-aligned lanes
    pad = max(plans.reduce_v.n_slots_pad, plans.reduce_e.n_slots_pad)
    yp = jnp.concatenate(
        [y, jnp.zeros((pad - y.shape[0], C0), y.dtype)], axis=0
    )
    if C != C0:
        yp = jnp.pad(yp, ((0, 0), (0, C - C0)))
    parts = []
    for c0 in range(0, C, 128):
        ypc = jax.lax.slice_in_dim(yp, c0, c0 + 128, axis=1)
        out_v = _onehot_reduce_region(plans.reduce_v, ypc, 128)
        out_e = _onehot_reduce_region(plans.reduce_e, ypc, 128)
        parts.append(jnp.concatenate([out_v, out_e], axis=0))
    out = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return out[:, :C0]
