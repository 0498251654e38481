"""MXU embedding-gradient scatter: sorted one-hot matmuls over a VMEM table.

The backward of a big-table embedding gather is XLA's weakest spot on TPU:
``dtable = zeros(V, K).at[ids].add(g)`` with B*T=204,800 duplicate rows costs
~2.8 ms at batch 4096 (measured v5e; ~12 us per 1k ids, insensitive to
sorting/uniqueness/width — round-1 "scatter floor", docs/ROADMAP.md), because
the lowering issues one serial read-modify-write per id.  The forward gather
of the *same* rows costs 368 us — an 8x asymmetry this kernel removes.

Approach (all shapes static):
  1. sort ids (XLA sort, ~160 us) and reorder g by the sort (gather, ~370 us),
  2. one Pallas kernel walks the sorted ids in 128-id tiles.  Each tile's ids
     fall in a narrow window of table rows (sorted!); the tile's contribution
     to that window is a one-hot MATMUL: onehotT (W8, 128) @ G8 (128, 128) on
     the MXU, accumulated into a VMEM-resident copy of the whole table.
  3. the table accumulator is lane-packed — ``rows_per_srow = 128 // K``
     table rows per 128-lane scratch row — because a (V, 16) f32 VMEM array
     pads its minor dim to 128 lanes (8x waste; the naive layout OOMs VMEM).
     G8 places each g row at lane offset (row % rows_per_srow) * K with
     ``rows_per_srow`` static selects.
  4. tiles whose 128 sorted ids straddle the window get a second, adjacent
     window matmul (covers spans up to 2*WINDOW rows); ids beyond even that
     (pathological skew) are handled by a serial per-id fallback guarded by
     ``pl.when`` so the common case never pays for it.
  5. the accumulator streams back to HBM in blocks during the last grid steps
     (a full-table output block would be double-buffered and OOM VMEM).

Cost model at (V=106496, K=16, N=204800): sort 163 us + reorder 370 us +
kernel ~(1600 tiles x [one MXU (128,128,128) matmul + ~150 VPU ops]) —
measured ~3.5x faster end-to-end than the XLA scatter.

Used as the custom VJP of ``take_fast_bwd`` (embedding lookups route here
via embed/tables.py when shapes qualify).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024      # ids per grid step (grid-step overhead bound below ~512)
WINDOW = 1024    # table rows covered by the primary one-hot matmul
LANES = 128
# below this many ids the XLA scatter is already cheap
MIN_IDS = 16384
# VMEM budget for the packed accumulator (v5e scoped limit is 16 MB and the
# kernel also stages id/g blocks)
MAX_ACC_BYTES = 12 * 1024 * 1024


def supports(num_rows: int, dim: int, n_ids: int) -> bool:
    if dim > LANES or n_ids < MIN_IDS:
        return False
    rps = LANES // dim
    # mirror scatter_add_rows' actual allocation: base rows + 2*WINDOW
    # straddle slop, rounded up to the 256-srow output block size
    srows = -(-num_rows // rps) + 2 * (WINDOW // rps)
    v8pad = -(-srows // 256) * 256
    return v8pad * LANES * 4 <= MAX_ACC_BYTES


def _kernel(ids_ref, ids_col_ref, g_ref, out_ref, acc_ref, *, k, rps, w,
            n_tiles, v8_blocks, vb8, v8pad):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(t < n_tiles)
    def _compute():
        # all intermediates stay 2-D: Mosaic cannot reshape 1-D vectors
        ids_row = ids_ref[...]              # (1, TILE) sorted within the tile
        first = ids_col_ref[0, 0]
        base = (first // rps) * rps         # srow-aligned window start
        w8 = w // rps
        srow = (ids_row - base) // rps      # (1, TILE) scratch row per id

        # G8: g rows placed at lane offset (id % rps) * k         (TILE, 128)
        # (base is rps-aligned so id % rps == local % rps)
        g = g_ref[...]                      # (TILE, k)
        mod_col = ids_col_ref[...] % rps    # (TILE, 1)
        g8 = jnp.zeros((TILE, LANES), jnp.float32)
        for m in range(rps):
            placed = jnp.pad(g, ((0, 0), (m * k, LANES - (m + 1) * k)))
            g8 = g8 + jnp.where(mod_col == m, placed, 0.0)

        iota = jax.lax.broadcasted_iota(jnp.int32, (w8, TILE), 0)

        def window_matmul(offset_srows):
            onehotT = (iota == (srow - offset_srows)).astype(jnp.float32)
            contrib = jax.lax.dot(
                onehotT, g8, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                               # (w8, 128)
            start = base // rps + offset_srows
            acc_ref[pl.ds(start, w8), :] += contrib

        window_matmul(0)

        in_second = (srow >= w8) & (srow < 2 * w8)
        @pl.when(jnp.any(in_second))
        def _straddle():
            window_matmul(w8)

        beyond = srow >= 2 * w8
        @pl.when(jnp.any(beyond))
        def _pathological():
            # serial per-id fallback; only runs for tiles whose 128 sorted
            # ids span more than 2*WINDOW table rows (extreme tail skew).
            # Uses the sublane-major ids copy — lane-dynamic indexing is not
            # lowerable.
            def one(i, _):
                row = ids_col_ref[pl.ds(i, 1), 0][0]
                @pl.when(row - base >= 2 * w)
                def _apply():
                    upd = jnp.zeros((1, LANES), jnp.float32)
                    gi = g_ref[pl.ds(i, 1), :]   # (1, k)
                    m_i = row % rps
                    for m in range(rps):
                        placed = jnp.pad(
                            gi, ((0, 0), (m * k, LANES - (m + 1) * k)))
                        upd = upd + jnp.where(m_i == m, placed, 0.0)
                    r8 = row // rps
                    acc_ref[pl.ds(r8, 1), :] += upd
                return 0

            jax.lax.fori_loop(0, TILE, one, 0)

    # dedicated write-only steps AFTER all compute steps: sorted ids do not
    # bound which accumulator block the later tiles touch tightly enough to
    # interleave writes with compute (an early flush loses later adds)
    @pl.when(t >= n_tiles)
    def _write():
        blk = t - n_tiles
        out_ref[:] = acc_ref[pl.ds(blk * vb8, vb8), :]


def scatter_add_rows(
    ids_sorted: jax.Array,   # (N,) int32, ascending, all in [0, num_rows)
    g_sorted: jax.Array,     # (N, K) f32, reordered to match ids_sorted
    num_rows: int,
    interpret: bool = False,
) -> jax.Array:
    """sum_i onehot(ids[i]) x g[i] -> (num_rows, K), via MXU window matmuls."""
    n, k = g_sorted.shape
    rps = LANES // k
    pad_n = (-n) % TILE
    if pad_n:
        # pad with copies of the last id and zero grads (adds nothing)
        ids_sorted = jnp.concatenate(
            [ids_sorted, jnp.broadcast_to(ids_sorted[-1:], (pad_n,))])
        g_sorted = jnp.pad(g_sorted, ((0, pad_n), (0, 0)))
        n += pad_n
    n_tiles = n // TILE
    w8 = WINDOW // rps
    srows = -(-num_rows // rps) + 2 * w8            # + straddle slop
    vb8 = 256                                       # 128 KB out blocks
    v8_blocks = -(-srows // vb8)
    v8pad = v8_blocks * vb8

    out8 = pl.pallas_call(
        functools.partial(_kernel, k=k, rps=rps, w=WINDOW, n_tiles=n_tiles,
                          v8_blocks=v8_blocks, vb8=vb8, v8pad=v8pad),
        grid=(n_tiles + v8_blocks,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda t, nt=n_tiles: (0, jnp.minimum(t, nt - 1))),
            pl.BlockSpec((TILE, 1), lambda t, nt=n_tiles: (jnp.minimum(t, nt - 1), 0)),
            pl.BlockSpec((TILE, k), lambda t, nt=n_tiles: (jnp.minimum(t, nt - 1), 0)),
        ],
        out_specs=pl.BlockSpec(
            (vb8, LANES),
            lambda t, nt=n_tiles: (jnp.maximum(t - nt, 0), 0),
        ),
        scratch_shapes=[pltpu.VMEM((v8pad, LANES), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((v8pad, LANES), jnp.float32),
        interpret=interpret,
    )(ids_sorted[None, :], ids_sorted[:, None], g_sorted)

    usable = out8[:, : rps * k].reshape(v8pad * rps, k)
    return usable[:num_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_fast_bwd(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[ids]`` whose backward is the MXU scatter (sort + window matmuls).

    Numerically equivalent to ``jnp.take(table, ids, axis=0, mode='clip')``
    up to f32 summation order for duplicate ids.  Caller guarantees
    ``supports(table.shape[0], table.shape[1], ids.size)``.
    """
    return jnp.take(table, ids, axis=0, mode="clip")


def _take_fwd(table, ids):
    return take_fast_bwd(table, ids), (table.shape, ids)


def _take_bwd(res, g):
    (num_rows, k), ids = res
    flat_ids = jnp.clip(ids.reshape(-1), 0, num_rows - 1)  # match fwd 'clip'
    order = jnp.argsort(flat_ids)
    ids_s = flat_ids[order]
    g_s = g.reshape(-1, k)[order]
    dtable = scatter_add_rows(ids_s, g_s, num_rows)
    return dtable, None


take_fast_bwd.defvjp(_take_fwd, _take_bwd)
