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
  * a ``lax.cond`` ladder picks the smallest cap >= the batch's true valid
    count, falling back to the full scatter for dense batches, so the
    result is EXACT for any density (the branch choice only affects speed).

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
    b_j = jnp.clip(jnp.searchsorted(off, j, side="right") - 1, 0, b - 1)
    t_j = j - off[b_j]
    valid = j < off[-1]
    # flat ROW gathers: a 2-D-indexed gather from the 3-D (B, T, K) operand
    # lowers to per-element slices; flattening to (B*T,) rows keeps it on
    # the fast row-gather path
    flat_idx = jnp.where(valid, b_j * t + t_j, 0)
    idv = jnp.where(
        valid, jnp.clip(ids.reshape(-1)[flat_idx], 0, num_rows - 1), 0
    )
    gv = g.reshape(-1, k)[flat_idx] * valid[:, None].astype(g.dtype)
    return jnp.zeros((num_rows, k), g.dtype).at[idv].add(gv)


def _full_scatter(ids, g, num_rows: int) -> jax.Array:
    k = g.shape[-1]
    flat = jnp.clip(ids.reshape(-1), 0, num_rows - 1)
    return jnp.zeros((num_rows, k), g.dtype).at[flat].add(g.reshape(-1, k))


def scatter_grad(ids, g, num_rows: int, caps=(2, 3, 4, 6, 8)) -> jax.Array:
    """dtable for a (B, T) valid-prefix id batch: cond ladder over caps.

    caps are DIVISORS of B*T (cap_i = B*T // d): the ladder tries the
    smallest buffer first and escalates; a batch denser than the largest
    divisor falls back to the exact full scatter.  Entries with id 0 always
    contribute to row 0, which the engine masks out of the forward — row 0
    still receives their (zero) gradient, exactly like the full scatter.
    """
    n = ids.size
    nvalid = jnp.sum(ids > 0)
    sizes = sorted({max(256, n // d) for d in caps if n // d >= 256})
    out = None

    def make(cap, next_fn):
        def run(_):
            return _compact_scatter(ids, g, num_rows, cap)

        def escalate(_):
            return next_fn(_)

        return lambda _: jax.lax.cond(nvalid <= cap, run, escalate, _)

    fn = lambda _: _full_scatter(ids, g, num_rows)
    for cap in reversed(sizes):
        fn = make(cap, fn)
    return fn(None)


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
