"""PAD-compacted embedding-gradient scatter for padded sequence lookups.

The backward of a sequence embedding gather is ``dtable =
zeros(V, K).at[ids].add(g)`` over B*T entries, and XLA lowers it to one
serial read-modify-write per ENTRY (~12 us per 1k at K=16 on v5e) no matter
how many entries are PAD — the round-1/2 "scatter floor"
(docs/ROADMAP.md; reference surface: the fc.embedding_column training path,
wide_and_deep.py:108-114).  WeChat-shaped 7-day behaviour sequences are
~85-90% PAD (geometric-ish lengths, T=50), so almost all of that serial work
adds zero.

This module removes the PAD work with STATIC shapes:

  * sequences are valid-prefix padded (row b holds ids[b, :len_b] then 0s),
    so entry j of the valid-entry stream maps to (b, t) = (searchsorted(
    cumsum(lens), j), j - off_b) — pure vectorised XLA, no sort of the
    B*T id stream;
  * the valid entries are compacted to a static ``cap``-sized buffer via
    that index map (a cap-row gather), and ONE cap-sized scatter updates the
    table — scatter work drops by the PAD fraction;
  * density handling lives on the HOST, not in-graph: an in-graph
    ``lax.cond`` (any shape of it) stalls the pipeline ~1 ms on the scalar
    predicate (measured, benchmarks/compact_probe2.py).  The Trainer checks
    each batch's ``*_len`` columns (``batch_fits_compact``) and routes
    dense batches to a separately-compiled plain-scatter step, so the
    result is EXACT for any density with zero hot-path branching.

``take_compact_bwd(tab, ids)`` is the drop-in custom-vjp gather used by
embed/tables.py behind TrainerConfig.compact_grad_scatter.  Works for any
(B, T) int id array whose valid ids are a per-row prefix; PAD entries (id 0)
may also appear under a valid slot mask — correctness only requires that
g rows at non-prefix positions are zero, which the engine's PAD masking
guarantees (embed_sequence multiplies by (ids > 0)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _live_lens(ids) -> jax.Array:
    """Per-row live length = (highest position with id > 0) + 1.

    Not simply ``sum(ids > 0)``: interior PAD holes (a masked slot inside
    the prefix, e.g. a hashed cross whose one side is missing) must stay
    inside the walked range so every id > 0 entry is covered for ANY
    pattern — holes just scatter their (engine-masked, zero) g to row 0,
    exactly as the full scatter does.  Entries BEYOND the live length have
    id == 0; the full scatter would add their g to row 0 too, so the two
    paths only differ on row 0 when trailing PAD carries non-zero
    cotangent — the engine's (ids > 0) masking guarantees it never does,
    and row 0 is the PAD row whose value is masked out of every forward.
    """
    t = ids.shape[1]
    pos = jnp.arange(1, t + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(ids > 0, pos, 0), axis=1)


def _compact_scatter(ids, g, num_rows: int, cap: int) -> jax.Array:
    """Scatter only the first-``cap`` valid-prefix entries (caller ensures
    the true valid count <= cap)."""
    b, t = ids.shape
    k = g.shape[-1]
    lens = _live_lens(ids)
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens).astype(jnp.int32)]
    )
    j = jnp.arange(cap, dtype=jnp.int32)
    # method='compare_all' is essential: the default 'scan' binary search
    # costs 4.75 ms for 51k queries on v5e where the vectorised all-pairs
    # compare costs 16 us (benchmarks/scatter_lab.py searchsorted_*)
    b_j = jnp.clip(
        jnp.searchsorted(off, j, side="right", method="compare_all") - 1,
        0, b - 1,
    )
    t_j = j - off[b_j]
    valid = j < off[-1]
    # flat ROW gathers: a 2-D-indexed gather from the 3-D (B, T, K) operand
    # lowers to per-element slices; flattening to (B*T,) rows keeps it on
    # the fast row-gather path.  flat_idx is non-decreasing ((b, t)
    # lexicographic over the valid prefix, then a constant tail), so the
    # sorted-indices hint applies.
    n = b * t
    flat_idx = jnp.where(valid, b_j * t + t_j, n - 1)
    flat_ids = ids.reshape(-1)
    idv = jnp.where(
        valid,
        jnp.clip(flat_ids.at[flat_idx].get(indices_are_sorted=True,
                                           mode="clip"),
                 0, num_rows - 1),
        0,
    )
    gv = g.reshape(-1, k).at[flat_idx].get(indices_are_sorted=True,
                                           mode="clip")
    gv = gv * valid[:, None].astype(g.dtype)
    return jnp.zeros((num_rows, k), g.dtype).at[idv].add(gv)


def _full_scatter(ids, g, num_rows: int) -> jax.Array:
    k = g.shape[-1]
    flat = jnp.clip(ids.reshape(-1), 0, num_rows - 1)
    return jnp.zeros((num_rows, k), g.dtype).at[flat].add(g.reshape(-1, k))


# The static compact buffer holds B*T // CAP_DIVISOR entries; batches
# whose live count exceeds it must take the plain-scatter executable (the
# host check below routes them there).  Only LONG sequences compact
# (engine gate, embed/tables.py): 7-day windows at T=50 run ~10-15% live
# and gain +11%; short-T lookups (tag lists at T=24, hashed crosses of
# them) run ~25%+ live and their narrow-row compaction gathers cost more
# than the scatter they save (measured: W&D 652k -> 612k ex/s with the
# cross compacted).
CAP_DIVISOR = 4
LONG_SEQ_T = 32
# below this many ids the full scatter is already cheap and the compaction
# bookkeeping (cumsum + searchsorted + cap gather) isn't worth its
# overhead.  Lives here with the other gate constants — the engine
# (embed/tables.py) and the host check below read the SAME values.
MIN_IDS = 16384


def _divisor_for(t: int) -> int:
    return CAP_DIVISOR


def eligible_seq_features(schema) -> list:
    """Schema sequence features whose lookups the engine may compact.

    Mirrors the trace-time engine gate (embed/tables.py checks
    ``ids.shape[-1] >= LONG_SEQ_T`` on the concrete lookup); both sides
    key off the same LONG_SEQ_T constant so the per-batch host check
    (``batch_fits_compact``) covers exactly the lookups that compact."""
    return [f for f in schema.sequence if f.max_length >= LONG_SEQ_T]


def scatter_grad(ids, g, num_rows: int,
                 cap_divisor: int | None = None) -> jax.Array:
    """dtable for a (B, T) valid-prefix id batch, scattering only the
    first ``B*T // cap_divisor`` live entries.

    CONTRACT: the batch's live count must fit the cap — entries ranked
    beyond it are dropped.  The decision is deliberately NOT in-graph: a
    data-dependent ``lax.cond`` (any shape of it) stalls the TPU pipeline
    ~1 ms waiting for the scalar predicate (measured, compact_probe2 /
    docs/ROADMAP.md), eating the whole win.  Instead the Trainer checks
    the batch's ``*_len`` columns ON HOST (``batch_fits_compact``) and
    dispatches dense batches to a separately-compiled plain-scatter step
    — no in-graph branch, exact at every density.
    """
    n = ids.size
    if cap_divisor is None:
        cap_divisor = _divisor_for(ids.shape[-1])
    return _compact_scatter(ids, g, num_rows, max(256, n // cap_divisor))


def batch_fits_compact(batch, schema, min_ids: int | None = None) -> bool:
    """Host-side check: every compact-eligible lookup in this batch fits
    its compact buffer.

    Conservative: every (B, T) lookup the engine can route to
    take_compact_bwd draws its ids from a schema sequence feature (or a
    hashed cross of one, whose live length is <= the underlying
    feature's), so checking sum(lens) <= B*T // cap_divisor for every
    sequence feature bounds them all.  A batch without a ``*_len`` column
    (custom feeders only ship one when a model consumes it) falls back to
    counting live prefixes from the id array itself — the engine still
    compacts that lookup, so the overflow check must still cover it.
    """
    import numpy as np

    if min_ids is None:
        min_ids = MIN_IDS
    for f in eligible_seq_features(schema):
        lens = batch.get(f.name + "_len")
        if lens is None:
            ids = batch.get(f.name)
            if ids is None:
                continue  # feature absent: the engine gets no lookup
            a = np.asarray(ids)
            # live length = (highest position with id > 0) + 1, matching
            # _live_lens — interior holes stay inside the walked range
            lens = np.where(
                np.any(a > 0, axis=1),
                a.shape[1] - np.argmax((a > 0)[:, ::-1], axis=1),
                0,
            )
        n = np.asarray(lens).shape[0] * f.max_length
        if (n >= min_ids
                and int(np.sum(lens)) > n // _divisor_for(f.max_length)):
            return False
    return True


@jax.custom_vjp
def take_compact_bwd(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[ids]`` (clip mode) whose backward is the PAD-compacted scatter.

    Numerically equivalent to ``jnp.take(table, ids, axis=0, mode='clip')``
    for any input; the backward is bit-exact vs the full scatter whenever
    every non-prefix position carries zero cotangent (the engine's PAD
    masking guarantees this) and f32-sum-order equivalent otherwise.
    """
    return jnp.take(table, ids, axis=0, mode="clip")


def _take_fwd(table, ids):
    return take_compact_bwd(table, ids), (table.shape, ids)


def _take_bwd(res, g):
    (num_rows, _), ids = res
    return scatter_grad(ids, g, num_rows), None


take_compact_bwd.defvjp(_take_fwd, _take_bwd)
