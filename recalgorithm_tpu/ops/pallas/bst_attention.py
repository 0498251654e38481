"""Fused BST multi-head attention Pallas kernel (tiny head_dim, B on lanes).

The XLA lowering of BST's attention core (reference transformer_layer.py's
scaled dot-product, our ops.attention.BSTTransformerBlock) is B*H independent
(T, d) x (d, T) matmuls with T=51, d<=16 — thousands of tiny MXU dispatches
plus (B, H, T, T) HBM tensors whose minor dim pads 51->128.  Honest
loop-slope timing puts that core at ~7 ms of BST's 13 ms step at batch 4096,
insensitive to dtype (op-count-bound, not bandwidth-bound).

This kernel computes softmax(mask(q kᵀ / sqrt(d))) v for all heads entirely
in VMEM, in *transposed* layout — batch on the lane axis, (time, feature) on
sublanes — so each (i, j) score is a VPU reduction vectorised over 100s of
examples.  The backward is analytic (also Pallas); unlike flash attention,
the TRAINING forward saves the (T, T) attention probabilities to HBM (f32,
~128 MB round trip at batch 4096) because at T=51 that traffic is cheaper
than the O(T^2 d) softmax recompute (~0.6 ms of VPU work) — the opposite
trade from long-sequence flash kernels.  The inference forward (the
custom_vjp primal) keeps the matrix in VMEM only.

Layout contract (wrappers handle it): q, k, v are (B, H, T, d) in the model;
internally (H, T*d, B).  d and T are small and static; B tiles over lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -(2.0**32) + 1


def _attn_rows(q_ref, k3, len_col, t, d, scale):
    """Yield-style helper is not jit-friendly; returns a function computing
    the masked softmax row attn_i (T, TB) for query position i."""

    def row(i):
        qi = q_ref[pl.ds(i * d, d), :]  # (d, TB)
        lij = jnp.sum(k3 * qi[None, :, :], axis=1) * scale  # (T, TB)
        jidx = jax.lax.broadcasted_iota(jnp.int32, lij.shape, 0)
        lij = jnp.where(jidx < len_col, lij, NEG_INF)
        m = jnp.max(lij, axis=0, keepdims=True)
        p = jnp.exp(lij - m)
        s = jnp.sum(p, axis=0, keepdims=True)
        return p / jnp.maximum(s, 1e-30)  # (T, TB)

    return row


def _fwd_kernel(q_ref, k_ref, v_ref, len_ref, o_ref, *, t: int, d: int):
    tb = q_ref.shape[1]
    scale = 1.0 / (d**0.5)
    k3 = k_ref[:].reshape(t, d, tb)
    v3 = v_ref[:].reshape(t, d, tb)
    len_col = len_ref[:]  # (1, TB) int32
    row = _attn_rows(q_ref, k3, len_col, t, d, scale)

    def body(i, _):
        attn = row(i)  # (T, TB)
        o_ref[pl.ds(i * d, d), :] = jnp.sum(attn[:, None, :] * v3, axis=0)
        return 0

    jax.lax.fori_loop(0, t, body, 0)


def _fwd_kernel_save_attn(q_ref, k_ref, v_ref, len_ref, o_ref, attn_ref,
                          *, t: int, d: int):
    """Forward that ALSO writes the attention probabilities: the training
    path's backward then skips the O(T^2 d) softmax recompute — cheaper than
    recomputing (~128 MB of f32 HBM traffic round trip at batch 4096 vs
    ~0.6 ms of VPU work per step).  ``attn_ref``'s dtype picks the
    precision/traffic trade: f32 is bit-identical to the recompute path;
    bf16 halves the round trip (probabilities are in [0, 1], so bf16's
    ~3 decimal digits cost ~1e-3 relative error on the backward only)."""
    tb = q_ref.shape[1]
    scale = 1.0 / (d**0.5)
    k3 = k_ref[:].reshape(t, d, tb)
    v3 = v_ref[:].reshape(t, d, tb)
    len_col = len_ref[:]
    row = _attn_rows(q_ref, k3, len_col, t, d, scale)

    tp = -(-t // 8) * 8  # 8-aligned per-query stride (Mosaic sublane rule)

    def body(i, _):
        attn = row(i)  # (T, TB)
        o_ref[pl.ds(i * d, d), :] = jnp.sum(attn[:, None, :] * v3, axis=0)
        attn_ref[pl.ds(i * tp, t), :] = attn.astype(attn_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t, body, 0)


def _bwd_kernel(
    q_ref, k_ref, v_ref, attn_saved_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    *, t: int, d: int,
):
    tb = q_ref.shape[1]
    scale = 1.0 / (d**0.5)
    k3 = k_ref[:].reshape(t, d, tb)
    v3 = v_ref[:].reshape(t, d, tb)

    tp = -(-t // 8) * 8  # matches the forward's 8-aligned stride

    def row(i):  # saved in the forward; no softmax recompute
        return attn_saved_ref[pl.ds(i * tp, t), :].astype(jnp.float32)

    # dk/dv accumulate into the (VMEM-resident) output blocks: carrying two
    # (T, d, TB) accumulators through the fori_loop costs ~200 vector
    # registers and forces spill/reload every iteration — measured
    # 4.3 ms/step vs 3.1 ms with per-iteration ref accumulation (the
    # carry-free forward was already at VPU speed-of-light).  Processing
    # CHUNK queries per iteration amortises the output-ref read-modify-write
    # 1/CHUNK-fold for another 15% (3.1 -> 2.6 ms); the chunk accumulator's
    # live range stays inside one loop body, so it schedules without the
    # cross-iteration spills of the old carry.
    dk_ref[:] = jnp.zeros((t * d, tb), jnp.float32)
    dv_ref[:] = jnp.zeros((t * d, tb), jnp.float32)
    chunk = 3

    def one_query(i, dk_acc, dv_acc):
        attn = row(i)  # (T, TB)
        qi = q_ref[pl.ds(i * d, d), :]
        doi = do_ref[pl.ds(i * d, d), :]  # (d, TB)
        dv_acc = dv_acc + attn[:, None, :] * doi[None, :, :]
        dp = jnp.sum(v3 * doi[None, :, :], axis=1)  # (T, TB)
        dsum = jnp.sum(dp * attn, axis=0, keepdims=True)  # (1, TB)
        dl = attn * (dp - dsum) * scale  # (T, TB); zero at masked j
        dq_ref[pl.ds(i * d, d), :] = jnp.sum(k3 * dl[:, None, :], axis=0)
        dk_acc = dk_acc + dl[:, None, :] * qi[None, :, :]
        return dk_acc, dv_acc

    def body(c, _):
        dk_acc = jnp.zeros((t, d, tb), jnp.float32)
        dv_acc = jnp.zeros((t, d, tb), jnp.float32)
        for j in range(chunk):
            dk_acc, dv_acc = one_query(c * chunk + j, dk_acc, dv_acc)
        dk_ref[:] += dk_acc.reshape(t * d, tb)
        dv_ref[:] += dv_acc.reshape(t * d, tb)
        return 0

    jax.lax.fori_loop(0, t // chunk, body, 0)
    for i in range(t - t % chunk, t):  # static tail when chunk doesn't divide T
        dk_acc = jnp.zeros((t, d, tb), jnp.float32)
        dv_acc = jnp.zeros((t, d, tb), jnp.float32)
        dk_acc, dv_acc = one_query(i, dk_acc, dv_acc)
        dk_ref[:] += dk_acc.reshape(t * d, tb)
        dv_ref[:] += dv_acc.reshape(t * d, tb)


def _to_kernel_layout(x: jax.Array) -> jax.Array:
    """(B, H, T, d) -> (H, T*d, B)."""
    b, h, t, d = x.shape
    return x.transpose(1, 2, 3, 0).reshape(h, t * d, b)


def _from_kernel_layout(x: jax.Array, b: int, h: int, t: int, d: int) -> jax.Array:
    return x.reshape(h, t, d, b).transpose(3, 0, 1, 2)


def _pick_tile(b: int, max_tile: int = 256) -> int:
    # the backward holds 8 (T*d, tile) blocks (double-buffered) plus two
    # (T, d, tile) accumulators in VMEM; tile=128 keeps it under the 16MB
    # scoped limit, the forward fits at 256.
    for tile in (max_tile, 128):
        if b % tile == 0:
            return tile
    raise ValueError(f"batch {b} must be a multiple of 128")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _bst_mha_core(
    q: jax.Array,        # (B, H, T, d) f32
    k: jax.Array,        # (B, H, T, d) f32
    v: jax.Array,        # (B, H, T, d) f32
    lengths: jax.Array,  # (B,) int32 — valid KEY positions (incl. target slot)
    interpret: bool = False,
    save_bf16: bool = False,  # backward-only; primal never saves
) -> jax.Array:
    b, h, t, d = q.shape
    tile = _pick_tile(b)
    qT, kT, vT = (_to_kernel_layout(x) for x in (q, k, v))
    lenT = lengths[None, :].astype(jnp.int32)  # (1, B)

    specs = [
        pl.BlockSpec((1, t * d, tile), lambda hh, i: (hh, 0, i)),
        pl.BlockSpec((1, t * d, tile), lambda hh, i: (hh, 0, i)),
        pl.BlockSpec((1, t * d, tile), lambda hh, i: (hh, 0, i)),
        pl.BlockSpec((1, tile), lambda hh, i: (0, i)),
    ]

    def kernel(q_ref, k_ref, v_ref, len_ref, o_ref):
        _fwd_kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], len_ref, o_ref.at[0],
            t=t, d=d,
        )

    outT = pl.pallas_call(
        kernel,
        grid=(h, b // tile),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, t * d, tile), lambda hh, i: (hh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((h, t * d, b), jnp.float32),
        interpret=interpret,
    )(qT, kT, vT, lenT)
    return _from_kernel_layout(outT, b, h, t, d)


def _mha_fwd(q, k, v, lengths, interpret, save_bf16):
    # training path: a 2-output forward also materialises the attention
    # probabilities (f32, or bf16 under save_bf16 for half the HBM round
    # trip) so the backward never recomputes the softmax
    b, h, t, d = q.shape
    save_dtype = jnp.bfloat16 if save_bf16 else jnp.float32
    tile = _pick_tile(b)
    qT, kT, vT = (_to_kernel_layout(x) for x in (q, k, v))
    lenT = lengths[None, :].astype(jnp.int32)
    io_spec = pl.BlockSpec((1, t * d, tile), lambda hh, i: (hh, 0, i))
    specs = [io_spec, io_spec, io_spec,
             pl.BlockSpec((1, tile), lambda hh, i: (0, i))]
    tp = -(-t // 8) * 8
    attn_spec = pl.BlockSpec((1, t * tp, tile), lambda hh, i: (hh, 0, i))

    def kernel(q_ref, k_ref, v_ref, len_ref, o_ref, attn_ref):
        _fwd_kernel_save_attn(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], len_ref, o_ref.at[0],
            attn_ref.at[0], t=t, d=d,
        )

    outT, attnT = pl.pallas_call(
        kernel,
        grid=(h, b // tile),
        in_specs=specs,
        out_specs=(io_spec, attn_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h, t * d, b), jnp.float32),
            jax.ShapeDtypeStruct((h, t * tp, b), save_dtype),
        ),
        interpret=interpret,
    )(qT, kT, vT, lenT)
    return _from_kernel_layout(outT, b, h, t, d), (q, k, v, attnT)


def _mha_bwd(interpret, save_bf16, res, g):
    q, k, v, attnT = res
    b, h, t, d = q.shape
    tile = _pick_tile(b, max_tile=128)
    qT, kT, vT = (_to_kernel_layout(x) for x in (q, k, v))
    gT = _to_kernel_layout(g)

    tp = -(-t // 8) * 8
    io_spec = pl.BlockSpec((1, t * d, tile), lambda hh, i: (hh, 0, i))
    specs = [
        io_spec, io_spec, io_spec,
        pl.BlockSpec((1, t * tp, tile), lambda hh, i: (hh, 0, i)),
        io_spec,
    ]

    def kernel(q_ref, k_ref, v_ref, attn_ref, do_ref, dq_ref, dk_ref, dv_ref):
        _bwd_kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], attn_ref.at[0],
            do_ref.at[0],
            dq_ref.at[0], dk_ref.at[0], dv_ref.at[0],
            t=t, d=d,
        )

    shp = jax.ShapeDtypeStruct((h, t * d, b), jnp.float32)
    dqT, dkT, dvT = pl.pallas_call(
        kernel,
        grid=(h, b // tile),
        in_specs=specs,
        out_specs=(io_spec, io_spec, io_spec),
        out_shape=(shp, shp, shp),
        interpret=interpret,
    )(qT, kT, vT, attnT, gT)
    dq = _from_kernel_layout(dqT, b, h, t, d)
    dk = _from_kernel_layout(dkT, b, h, t, d)
    dv = _from_kernel_layout(dvT, b, h, t, d)
    return dq, dk, dv, None


_bst_mha_core.defvjp(_mha_fwd, _mha_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bst_mha_core_t(
    qT: jax.Array,       # (H, T*d, B) f32 — kernel layout, B on lanes
    kT: jax.Array,
    vT: jax.Array,
    lenT: jax.Array,     # (1, B) int32
    t: int,
    interpret: bool = False,
    save_bf16: bool = False,
) -> jax.Array:
    """Transposed-operand twin of _bst_mha_core: callers that can PRODUCE
    the kernel layout directly (the projection einsums emit ``htjb``) skip
    the explicit (B, H, T, d) <-> (H, T*d, B) HBM copies on all six
    fwd/bwd tensors — XLA folds the layout into the dots instead."""
    h, td, b = qT.shape
    d = td // t
    tile = _pick_tile(b)
    io_spec = pl.BlockSpec((1, td, tile), lambda hh, i: (hh, 0, i))
    specs = [io_spec, io_spec, io_spec,
             pl.BlockSpec((1, tile), lambda hh, i: (0, i))]

    def kernel(q_ref, k_ref, v_ref, len_ref, o_ref):
        _fwd_kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], len_ref, o_ref.at[0],
            t=t, d=d,
        )

    return pl.pallas_call(
        kernel,
        grid=(h, b // tile),
        in_specs=specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((h, td, b), jnp.float32),
        interpret=interpret,
    )(qT, kT, vT, lenT)


def _mha_t_fwd(qT, kT, vT, lenT, t, interpret, save_bf16):
    h, td, b = qT.shape
    d = td // t
    tile = _pick_tile(b)
    save_dtype = jnp.bfloat16 if save_bf16 else jnp.float32
    io_spec = pl.BlockSpec((1, td, tile), lambda hh, i: (hh, 0, i))
    specs = [io_spec, io_spec, io_spec,
             pl.BlockSpec((1, tile), lambda hh, i: (0, i))]
    tp = -(-t // 8) * 8
    attn_spec = pl.BlockSpec((1, t * tp, tile), lambda hh, i: (hh, 0, i))

    def kernel(q_ref, k_ref, v_ref, len_ref, o_ref, attn_ref):
        _fwd_kernel_save_attn(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], len_ref, o_ref.at[0],
            attn_ref.at[0], t=t, d=d,
        )

    outT, attnT = pl.pallas_call(
        kernel,
        grid=(h, b // tile),
        in_specs=specs,
        out_specs=(io_spec, attn_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h, td, b), jnp.float32),
            jax.ShapeDtypeStruct((h, t * tp, b), save_dtype),
        ),
        interpret=interpret,
    )(qT, kT, vT, lenT)
    return outT, (qT, kT, vT, attnT)


def _mha_t_bwd(t, interpret, save_bf16, res, g):
    qT, kT, vT, attnT = res
    h, td, b = qT.shape
    d = td // t
    tile = _pick_tile(b, max_tile=128)
    tp = -(-t // 8) * 8
    io_spec = pl.BlockSpec((1, td, tile), lambda hh, i: (hh, 0, i))
    specs = [
        io_spec, io_spec, io_spec,
        pl.BlockSpec((1, t * tp, tile), lambda hh, i: (hh, 0, i)),
        io_spec,
    ]

    def kernel(q_ref, k_ref, v_ref, attn_ref, do_ref, dq_ref, dk_ref, dv_ref):
        _bwd_kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], attn_ref.at[0],
            do_ref.at[0],
            dq_ref.at[0], dk_ref.at[0], dv_ref.at[0],
            t=t, d=d,
        )

    shp = jax.ShapeDtypeStruct((h, td, b), jnp.float32)
    dqT, dkT, dvT = pl.pallas_call(
        kernel,
        grid=(h, b // tile),
        in_specs=specs,
        out_specs=(io_spec, io_spec, io_spec),
        out_shape=(shp, shp, shp),
        interpret=interpret,
    )(qT, kT, vT, attnT, g)
    return dqT, dkT, dvT, None


_bst_mha_core_t.defvjp(_mha_t_fwd, _mha_t_bwd)


def bst_mha_fused_t(
    qT: jax.Array,       # (H, T*d, B) f32 — kernel layout
    kT: jax.Array,
    vT: jax.Array,
    lengths: jax.Array,  # (B,) int32
    t: int,
    interpret: bool = False,
    save_bf16: bool = False,
) -> jax.Array:
    """Kernel-layout fused BST attention: in AND out are (H, T*d, B).

    Pads the lane (batch) axis to a 128 multiple like bst_mha_fused."""
    b = qT.shape[-1]
    lenT = lengths[None, :].astype(jnp.int32)
    pad = (-b) % 128
    if pad:
        qT, kT, vT = (
            jnp.pad(x, ((0, 0), (0, 0), (0, pad))) for x in (qT, kT, vT)
        )
        lenT = jnp.pad(lenT, ((0, 0), (0, pad)), constant_values=1)
    out = _bst_mha_core_t(qT, kT, vT, lenT, t, interpret, save_bf16)
    return out[:, :, : b] if pad else out


def bst_mha_fused(
    q: jax.Array,        # (B, H, T, d) f32
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,  # (B,) int32
    interpret: bool = False,
    save_bf16: bool = False,
) -> jax.Array:
    """Fused BST multi-head attention for any batch size.

    The kernel tiles the batch in 128-lane blocks; batches that are not a
    multiple of 128 are zero-padded up to one (padded rows get length 1 so
    their softmax stays finite) and sliced back, so any configured
    ``batch_size`` works — padding a 4095-row batch costs one extra tile.

    ``save_bf16`` stores the training forward's saved attention
    probabilities as bf16 (half the HBM round trip; ~1e-3 relative error on
    dq/dk/dv only — the primal output is always f32-exact).
    """
    b = q.shape[0]
    pad = (-b) % 128
    if pad == 0:
        return _bst_mha_core(q, k, v, lengths, interpret, save_bf16)
    padded = [jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0))) for x in (q, k, v)]
    lengths_p = jnp.pad(lengths, (0, pad), constant_values=1)
    out = _bst_mha_core(*padded, lengths_p, interpret, save_bf16)
    return out[:b]


def mha_reference(q, k, v, lengths):
    """Pure-jnp reference: softmax(mask(q k^T / sqrt(d))) v, key-side mask."""
    b, h, t, d = q.shape
    logits = jnp.einsum("bhik,bhjk->bhij", q, k) / (d**0.5)
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    logits = jnp.where(mask, logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjk->bhik", attn, v)
