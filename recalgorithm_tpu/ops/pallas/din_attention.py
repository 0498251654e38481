"""Fused DIN target-attention Pallas kernel.

Computes the whole DIN attention block (reference din_attention.py:4-43) in
one VMEM-resident pass per batch tile, in *transposed* layout — batch on the
lane dimension, features/time on sublanes — so the per-step dynamic slices
land on the sublane axis (lane-axis dynamic indexing must be 128-aligned on
TPU; sublane indexing is free):

    per t:  x_t  = [q; k_t; q-k_t; q*k_t]           # (4H, TB), VMEM only
            h_t  = relu(W1' x_t + b1)               # (64, TB)
            h_t  = relu(W2' h_t + b2)               # (32, TB)
            w_t  = W3' h_t + b3                     # (1, TB)
    pooling is accumulated online (flash-attention style for the softmax
    variant: running max / normaliser / weighted sum), so no (B, T, *)
    intermediate ever exists — the XLA version writes the (B, T, 64) and
    (B, T, 32) activations to HBM between matmuls.

Host-side wrappers transpose inputs/outputs; numerically equivalent to
ops.attention.DINAttention (tests/test_pallas_kernels.py).  Enable in the
model via DINConfig(use_fused_attention=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(2.0**32) + 1


def _kernel(
    q_ref,     # (H, TB)
    k_ref,     # (T*H, TB)  time-major stacked keys
    len_ref,   # (1, TB) int32
    w1_ref, b1_ref,   # (64, 4H), (64, 1)
    w2_ref, b2_ref,   # (32, 64), (32, 1)
    w3_ref, b3_ref,   # (1, 32), (1, 1)
    out_ref,   # (H, TB)
    *, seq_len: int, use_softmax: bool,
):
    q = q_ref[:]                    # (H, TB)
    h, tb = q.shape
    lengths = len_ref[:]            # (1, TB)
    scale = 1.0 / (h**0.5)

    # split W1' into its four (64, H) column blocks (x = [q; k; q-k; q*k]):
    # W1'x = (W1a+W1c)'q + (W1b-W1c)'k + W1d'(q*k).  The q term is constant
    # over time -> hoisted out of the loop; per step only two H-contraction
    # matmuls remain instead of one 4H one.
    w1 = w1_ref[:]
    w1a, w1b, w1c, w1d = (w1[:, i * h : (i + 1) * h] for i in range(4))
    wq = (
        jnp.dot(w1a + w1c, q, preferred_element_type=jnp.float32) + b1_ref[:]
    )  # (64, TB)
    w1k = w1b - w1c

    def scores(kt, i):
        hd = jnp.maximum(
            jnp.dot(w1k, kt, preferred_element_type=jnp.float32)
            + jnp.dot(w1d, q * kt, preferred_element_type=jnp.float32)
            + wq, 0.0,
        )
        hd = jnp.maximum(
            jnp.dot(w2_ref[:], hd, preferred_element_type=jnp.float32)
            + b2_ref[:], 0.0,
        )
        wt = (
            jnp.dot(w3_ref[:], hd, preferred_element_type=jnp.float32)
            + b3_ref[:]
        )  # (1, TB)
        valid = (i < lengths).astype(jnp.float32)  # (1, TB)
        return wt, valid

    if use_softmax:
        # online softmax: m = running max, s = normaliser, o = weighted sum
        def step(i, carry):
            m, s, o = carry
            kt = k_ref[pl.ds(pl.multiple_of(i * h, h), h), :]
            wt, valid = scores(kt, i)
            wt = (wt * valid + NEG_INF * (1.0 - valid)) * scale
            m_new = jnp.maximum(m, wt)
            corr = jnp.exp(m - m_new)
            p = jnp.exp(wt - m_new)  # (1, TB)
            return m_new, s * corr + p, o * corr + p * kt

        init = (
            jnp.full((1, tb), NEG_INF, jnp.float32),
            jnp.zeros((1, tb), jnp.float32),
            jnp.zeros((h, tb), jnp.float32),
        )
        _, s, o = jax.lax.fori_loop(0, seq_len, step, init)
        out_ref[:] = o / jnp.maximum(s, 1e-30)
    else:
        def step(i, o):
            kt = k_ref[pl.ds(pl.multiple_of(i * h, h), h), :]
            wt, valid = scores(kt, i)
            return o + (wt * valid) * kt

        out_ref[:] = jax.lax.fori_loop(
            0, seq_len, step, jnp.zeros((h, tb), jnp.float32)
        )


def din_attention_reference(query, keys, lengths, params, use_softmax=False):
    """Pure-jnp reference (identical math to ops.attention.DINAttention).

    Used as the backward-pass recompute for the fused kernel's custom VJP —
    the flash-attention pattern: fused forward, XLA-differentiated recompute
    backward.
    """
    b, t, h = keys.shape
    q = jnp.broadcast_to(query[:, None, :], (b, t, h))
    x = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
    x = jax.nn.relu(x @ params["f1_att"]["kernel"] + params["f1_att"]["bias"])
    x = jax.nn.relu(x @ params["f2_att"]["kernel"] + params["f2_att"]["bias"])
    w = (x @ params["f3_att"]["kernel"] + params["f3_att"]["bias"])[..., 0]
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    if use_softmax:
        w = jnp.where(mask, w, NEG_INF)
        w = jax.nn.softmax(w / (h**0.5), axis=1)
    else:
        w = w * mask.astype(w.dtype)
    return jnp.einsum("bt,bth->bh", w, keys)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _din_attention_core(
    query: jax.Array,    # (B, H) f32
    keys: jax.Array,     # (B, T, H) f32
    lengths: jax.Array,  # (B,) i32
    params: dict,        # f1_att/f2_att/f3_att kernels+biases (DINAttention names)
    use_softmax: bool = False,
    tile_b: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    b, t, h = keys.shape
    qT = query.T                                      # (H, B)
    kT = keys.transpose(1, 2, 0).reshape(t * h, b)    # (T*H, B) time-major
    lenT = lengths[None, :].astype(jnp.int32)         # (1, B)
    w1T = params["f1_att"]["kernel"].T                # (64, 4H)
    b1c = params["f1_att"]["bias"][:, None]
    w2T = params["f2_att"]["kernel"].T                # (32, 64)
    b2c = params["f2_att"]["bias"][:, None]
    w3T = params["f3_att"]["kernel"].T                # (1, 32)
    b3c = params["f3_att"]["bias"][:, None]

    tile_b = min(tile_b, b)
    if b % tile_b:
        raise ValueError(f"batch {b} not divisible by tile_b {tile_b}")

    def tile0(i):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((h, tile_b), lambda i: (0, i)),
        pl.BlockSpec((t * h, tile_b), lambda i: (0, i)),
        pl.BlockSpec((1, tile_b), lambda i: (0, i)),
    ] + [pl.BlockSpec(p.shape, tile0) for p in (w1T, b1c, w2T, b2c, w3T, b3c)]

    outT = pl.pallas_call(
        functools.partial(_kernel, seq_len=t, use_softmax=use_softmax),
        grid=(b // tile_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((h, tile_b), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((h, b), jnp.float32),
        interpret=interpret,
    )(qT, kT, lenT, w1T, b1c, w2T, b2c, w3T, b3c)
    return outT.T


def _fused_fwd(query, keys, lengths, params, use_softmax, tile_b, interpret):
    out = _din_attention_core(
        query, keys, lengths, params, use_softmax, tile_b, interpret
    )
    return out, (query, keys, lengths, params)


def _fused_bwd(use_softmax, tile_b, interpret, res, g):
    query, keys, lengths, params = res
    _, vjp = jax.vjp(
        lambda q, k, p: din_attention_reference(q, k, lengths, p, use_softmax),
        query, keys, params,
    )
    dq, dk, dp = vjp(g)
    return dq, dk, None, dp


_din_attention_core.defvjp(_fused_fwd, _fused_bwd)


def din_attention_fused(
    query: jax.Array,    # (B, H) f32
    keys: jax.Array,     # (B, T, H) f32
    lengths: jax.Array,  # (B,) i32
    params: dict,
    use_softmax: bool = False,
    tile_b: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Fused DIN target attention for any batch size.

    Zero-pads the batch to a multiple of 128 lanes (padded rows get length 0
    -> zero attention output) and picks the largest tile that divides it, so
    arbitrary configured batch sizes work.
    """
    b = query.shape[0]
    pad = (-b) % 128
    bp = b + pad
    tile = next(t for t in (tile_b, 1024, 512, 256, 128) if t <= bp and bp % t == 0)
    if pad == 0:
        return _din_attention_core(
            query, keys, lengths, params, use_softmax, tile, interpret
        )
    q_p = jnp.pad(query, ((0, pad), (0, 0)))
    k_p = jnp.pad(keys, ((0, pad), (0, 0), (0, 0)))
    len_p = jnp.pad(lengths, (0, pad))
    out = _din_attention_core(
        q_p, k_p, len_p, params, use_softmax, tile, interpret
    )
    return out[:b]
