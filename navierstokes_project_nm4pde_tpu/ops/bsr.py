"""Supernode block-sparse (block-ELL) applies for the CONSTANT operators.

The gather rate on this backend is ROW-rate bound, not byte bound: ~10 ns
per row for 12 B rows but ~43 GB/s once rows are ~384 B wide
(PERFORMANCE.md, "Measured backend characteristics").  Grouping `bs`
RCM-consecutive nodes into one supernode makes every gathered row a
[bs, C] panel (384 B at bs=32, C=3 f32), so an assembled operator whose
sparsity follows the supernode adjacency streams its source at the
wide-row rate, while the dense [bs, bs] blocks are one fused VPU
multiply-reduce over a value array that reads at plain HBM bandwidth.

Used for the constant blocks of the time step -- the divergence D and the
pressure gradient G = -D^T (the reference's B / -B^T blocks,
ref: src/NavierStokes2D.cpp:259-262), and optionally the constant SPD
velocity block K = M/dt + nu A of the explicit-convection stepper.  Their
values are assembled once on the host in float64; only nnz-level COO
triples cross the host->device tunnel (the dense block values are
materialised by a one-time on-device scatter -- transfer is the scarce
resource at ~1M DoF, not one-time device work).

Why this beats the round-3 forms at bench scale (965k DoF): the
element-pass divergence costs ~22-25 ms (element gather + contraction +
big slot reduce) and the assembled-ELL gradient ~20.7 ms (nnz(D) narrow
row gathers); the BSR forms gather ~26k / ~49k WIDE rows and stream one
0.3-0.6 GB value array => ~1-2 ms each.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BSRMatrix:
    """Block-ELL operator [n_rows x n_src] with Cout x Cin component blocks.

    y[I*bs + a, o] = sum_{w, b, i} vals[I, w, a, o, b, i] * x[cols[I, w]*bs + b, i]

    `cols` pads with `nb_src` (a zero source block appended at apply time);
    padded value blocks are zero.  Source/destination rows beyond
    n_src/n_rows are padding."""

    cols: jax.Array  # [NB, W] int32 source-block ids (pad = nb_src)
    vals: jax.Array  # [NB, W, bs, Cout, bs, Cin]
    nb_src: int = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_src: int = dataclasses.field(metadata=dict(static=True))
    bs: int = dataclasses.field(metadata=dict(static=True))
    # "vpu": broadcast multiply + sum (exact f32, no MXU pass -- the
    # engine-wide element_contraction finding); "einsum": MXU lowering.
    contraction: str = dataclasses.field(
        default="vpu", metadata=dict(static=True)
    )

    @property
    def cout(self) -> int:
        return self.vals.shape[3]

    @property
    def cin(self) -> int:
        return self.vals.shape[5]


def build_bsr(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    n_src: int,
    bs: int = 32,
    dtype=jnp.float32,
    contraction: str = "vpu",
) -> BSRMatrix:
    """Build a BSRMatrix from COO triples (duplicate (row, col) pairs must
    already be merged).  `vals` is [nnz, Cout, Cin] ([nnz] => 1x1 blocks).

    Host side computes only the block pattern and flat scatter indices;
    the dense value array is materialised on device (sorted unique scatter,
    one-time)."""
    rows = np.asarray(rows, dtype=np.int64).reshape(-1)
    cols = np.asarray(cols, dtype=np.int64).reshape(-1)
    vals = np.asarray(vals)
    if vals.ndim == 1:
        vals = vals[:, None, None]
    nnz, Cout, Cin = vals.shape
    NB = -(-n_rows // bs)
    nb_src = -(-n_src // bs)

    I = rows // bs
    a = rows % bs
    J = cols // bs
    b = cols % bs

    # Block pattern: unique (I, J), ELL-padded per block row.
    key = I * nb_src + J
    uniq, inv = np.unique(key, return_inverse=True)
    bI = uniq // nb_src
    bJ = uniq % nb_src
    counts = np.bincount(bI, minlength=NB)
    W = max(int(counts.max()) if counts.size else 1, 1)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # np.unique returns keys sorted, so blocks of one row are consecutive.
    slot_of_block = np.arange(len(uniq)) - starts[bI]  # w slot per block
    col_table = np.full((NB, W), nb_src, dtype=np.int64)
    col_table[bI, slot_of_block] = bJ

    # Flat dense index per COO component entry.
    blk = inv  # block id per nnz
    w = slot_of_block[blk]
    base = (((I * W + w) * bs + a) * Cout)  # [nnz]
    o_idx = np.arange(Cout, dtype=np.int64)
    i_idx = np.arange(Cin, dtype=np.int64)
    flat = (
        (base[:, None, None] + o_idx[None, :, None]) * (bs * Cin)
        + (b[:, None, None] * Cin + i_idx[None, None, :])
    ).reshape(-1)
    v_flat = vals.reshape(-1)
    # Drop exact zeros (ELL padding upstream); sort for the device scatter.
    keep = v_flat != 0.0
    flat, v_flat = flat[keep], v_flat[keep]
    order = np.argsort(flat)
    flat, v_flat = flat[order], v_flat[order]

    N_total = NB * W * bs * Cout * bs * Cin
    if N_total >= np.iinfo(np.int32).max:
        raise ValueError(
            f"BSR dense value array too large for int32 indexing "
            f"({N_total}); reduce bs or bucket the rows"
        )
    dense = (
        jnp.zeros((N_total,), dtype)
        .at[jnp.asarray(flat, jnp.int32)]
        .set(
            jnp.asarray(v_flat, dtype),
            unique_indices=True,
            indices_are_sorted=True,
        )
        .reshape(NB, W, bs, Cout, bs, Cin)
    )
    return BSRMatrix(
        cols=jnp.asarray(col_table, jnp.int32),
        vals=dense,
        nb_src=nb_src,
        n_rows=n_rows,
        n_src=n_src,
        bs=bs,
        contraction=contraction,
    )


def apply_bsr(m: BSRMatrix, x: jax.Array) -> jax.Array:
    """y = A x: [n_src, Cin] -> [n_rows, Cout]."""
    bs, Cin = m.bs, m.cin
    pad = m.nb_src * bs - m.n_src
    xp = jnp.concatenate(
        [x, jnp.zeros((pad + bs, Cin), x.dtype)], axis=0
    )  # trailing zero block = the cols pad target
    xb = xp.reshape(m.nb_src + 1, bs, Cin)
    g = xb[m.cols]  # [NB, W, bs, Cin] -- wide-row gather
    if m.contraction == "vpu":
        y = (m.vals * g[:, :, None, None, :, :]).sum(axis=(1, 4, 5))
    else:
        y = jnp.einsum("nwaobi,nwbi->nao", m.vals, g)
    return y.reshape(-1, m.cout)[: m.n_rows]


# ----------------------------------------------------------------------
# D / G construction from the host divergence ELL
# ----------------------------------------------------------------------
def _divergence_coo(schur_host: dict):
    """COO triples of D from the host ELL (`schur_host["D_cols"/"D_vals"]`,
    [n_p, Wd] cols / [n_p, Wd, dim] vals, duplicates pre-merged)."""
    D_cols, D_vals = schur_host["D_cols"], schur_host["D_vals"]
    n_p, Wd = D_cols.shape
    keep = (D_vals != 0.0).any(axis=-1)
    rows = np.broadcast_to(np.arange(n_p)[:, None], (n_p, Wd))[keep]
    cols = D_cols[keep]
    vals = D_vals[keep]  # [nnz, dim]
    return rows, cols, vals


def build_divergence_bsr(
    schur_host: dict, n_unodes: int, n_pnodes: int, bs: int = 32,
    dtype=jnp.float32, contraction: str = "vpu",
) -> BSRMatrix:
    """D as a BSR operator: u [n_unodes, dim] -> D u [n_pnodes]
    (apply via `apply_bsr(dbsr, u)[:, 0]`)."""
    rows, cols, vals = _divergence_coo(schur_host)
    return build_bsr(
        rows, cols, vals[:, None, :], n_pnodes, n_unodes,
        bs=bs, dtype=dtype, contraction=contraction,
    )


def build_gradient_bsr(
    schur_host: dict, n_unodes: int, n_pnodes: int, bs: int = 32,
    dtype=jnp.float32, contraction: str = "vpu",
) -> BSRMatrix:
    """G = -D^T as a BSR operator: p [n_pnodes, 1] -> G p [n_unodes, dim]
    (apply via `apply_bsr(gbsr, p[:, None])`)."""
    rows, cols, vals = _divergence_coo(schur_host)
    return build_bsr(
        cols, rows, -vals[:, :, None], n_unodes, n_pnodes,
        bs=bs, dtype=dtype, contraction=contraction,
    )
