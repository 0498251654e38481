"""Behaviour-sequence attention: DIN target attention and the BST transformer.

At the reference's sequence length (T <= 51) a flash-attention decomposition
buys nothing — the whole (B, T, K) activation fits comfortably in VMEM — so
these are written as plain fused einsum chains that XLA compiles into a few
MXU matmuls with all the elementwise work fused in.  A Pallas fused variant of
DIN attention lives in ops/pallas/din_attention.py for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.ops.activations import leakyrelu
from recalgorithm_tpu.ops.mlp import Dense, glorot_uniform

NEG_INF = -(2.0**32) + 1  # the reference's masking constant (din_attention.py:31)


def sequence_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) -> (B, T) bool, True for positions < length (tf.sequence_mask)."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def resolve_fused(flag) -> bool:
    """'auto' (the config default) -> Pallas kernels on TPU backends, plain
    XLA elsewhere; explicit bool / 'true' / 'false' wins.  CLI users on a
    real chip get the fused path without knowing the flag exists."""
    if isinstance(flag, bool):
        return flag
    s = str(flag).lower()
    if s == "auto":
        import jax

        return jax.default_backend() not in ("cpu", "gpu")
    return s in ("true", "1", "yes")


class DINAttention(nn.Module):
    """DIN target-vs-history attention pooling (reference din_attention.py:4-43).

    weights = MLP_64_32_1(concat(q, k, q-k, q*k)) per position;
    masked by sequence length; optionally scaled-softmax'd (flag parity with
    --use_softmax); output = weight-weighted sum over the sequence.
    """

    use_softmax: bool = False
    fused: bool = False        # route through the Pallas kernel (TPU)
    interpret: bool = False    # Pallas interpreter mode (CPU tests)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,    # (B, H) target item embedding
        keys: jax.Array,     # (B, T, H) behaviour sequence embeddings
        lengths: jax.Array,  # (B,) valid lengths
    ) -> jax.Array:
        b, t, h = keys.shape
        f1 = Dense(64, name="f1_att")
        f2 = Dense(32, name="f2_att")
        f3 = Dense(1, name="f3_att")
        if self.fused:
            from recalgorithm_tpu.ops.pallas.din_attention import (
                din_attention_fused,
            )

            # materialise the same param tree as the unfused path (the tiny
            # dummy chain is dead code the compiler eliminates)
            _ = f3(nn.relu(f2(nn.relu(f1(jnp.zeros((1, 4 * h)))))))
            params = {
                "f1_att": f1.variables["params"],
                "f2_att": f2.variables["params"],
                "f3_att": f3.variables["params"],
            }
            return din_attention_fused(
                query, keys, lengths, params,
                use_softmax=self.use_softmax, interpret=self.interpret,
            )
        q = jnp.broadcast_to(query[:, None, :], (b, t, h))
        x = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)  # (B, T, 4H)
        x = nn.relu(f1(x))
        x = nn.relu(f2(x))
        w = f3(x)[..., 0]  # (B, T)

        mask = sequence_mask(lengths, t)
        if self.use_softmax:
            w = jnp.where(mask, w, NEG_INF)
            w = w / (h**0.5)  # variance alignment (din_attention.py:34)
            w = jax.nn.softmax(w, axis=1)
        else:
            # paper-faithful: raw weights, masked to zero (din_attention.py:37-38)
            w = w * mask.astype(w.dtype)
        return jnp.einsum("bt,bth->bh", w, keys)


class BSTTransformerBlock(nn.Module):
    """One BST transformer block (reference transformer_layer.py:6-81).

    Learned position embedding with slot 0 reserved for the target item;
    position embedding added to Q and K inputs only (not V); per-head
    projections; scaled dot-product attention with key-side length masking;
    multi-head concat + W_o; residual + LayerNorm; single leakyrelu FFN;
    residual + LayerNorm.

    Parity note: the reference builds its additive mask with shape
    (B, 1, T, 1), which broadcasts over *key* positions and therefore adds a
    constant to whole softmax rows — a no-op (softmax is shift-invariant), so
    the reference effectively attends over padding.  We apply the mask on the
    key axis (B, 1, 1, T) as intended by the paper; this only changes
    behaviour for padded positions.
    """

    num_heads: int
    max_length: int
    use_position_embedding: bool = True
    # False = pure XLA; True = Pallas attention core (bst_attention.py).
    # (A whole-block Pallas kernel was measured 18 vs 11.5 ms and removed
    # in round 3 — docs/ROADMAP.md negative results.)
    fused: bool = False
    interpret: bool = False  # run the kernel interpreted (CPU tests)
    save_attn_bf16: bool = False  # bf16 saved attention probs (fused only)
    # Produce/consume the Pallas kernel's (H, T*d, B) layout directly from
    # the projection einsums instead of explicit transposes around the
    # kernel (fused only): XLA folds the layout change into the dots.
    kernel_layout: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,        # (B, T, d) target-at-slot-0 + behaviour sequence
        lengths: jax.Array,  # (B,) valid lengths (incl. the target slot)
    ) -> jax.Array:
        b, t, d = x.shape
        q_in = k_in = x
        if self.use_position_embedding:
            pos_table = self.param(
                "position_embedding", glorot_uniform, (self.max_length, d)
            )
            pos = pos_table[:t][None, :, :]
            q_in = q_in + pos
            k_in = k_in + pos

        w_q = self.param("w_q", glorot_uniform, (self.num_heads, d, d))
        w_k = self.param("w_k", glorot_uniform, (self.num_heads, d, d))
        w_v = self.param("w_v", glorot_uniform, (self.num_heads, d, d))
        w_o = self.param("w_o", glorot_uniform, (self.num_heads * d, d))

        if self.fused and self.kernel_layout:
            from recalgorithm_tpu.ops.pallas.bst_attention import (
                bst_mha_fused_t,
            )

            h_ = self.num_heads
            qT = jnp.einsum("btk,hkj->htjb", q_in, w_q).reshape(h_, t * d, b)
            kT = jnp.einsum("btk,hkj->htjb", k_in, w_k).reshape(h_, t * d, b)
            vT = jnp.einsum("btk,hkj->htjb", x, w_v).reshape(h_, t * d, b)
            outT = bst_mha_fused_t(qT, kT, vT, lengths, t, self.interpret,
                                   self.save_attn_bf16)
            # un-transpose folds into the output projection contraction
            out = jnp.einsum("htjb,hjm->btm", outT.reshape(h_, t, d, b),
                             w_o.reshape(h_, d, d))
            net = nn.LayerNorm(name="ln1")(out + x)
            ffn = Dense(d, name="ffn")(net)
            ffn = leakyrelu(ffn)
            return nn.LayerNorm(name="ln2")(ffn + net)

        q = jnp.einsum("btk,hkj->bhtj", q_in, w_q)
        k = jnp.einsum("btk,hkj->bhtj", k_in, w_k)
        v = jnp.einsum("btk,hkj->bhtj", x, w_v)

        if self.fused:
            from recalgorithm_tpu.ops.pallas.bst_attention import bst_mha_fused

            # XLA lowers the (B*H, T, T) batched tiny matmuls + softmax to
            # thousands of under-filled MXU dispatches (~7ms of BST's step at
            # batch 4096); the kernel keeps the whole core in VMEM.
            score = bst_mha_fused(q, k, v, lengths, self.interpret,
                                  self.save_attn_bf16)
        else:
            logits = jnp.einsum("bhik,bhjk->bhij", q, k) / (d**0.5)
            key_mask = sequence_mask(lengths, t)[:, None, None, :]  # (B,1,1,T)
            logits = jnp.where(key_mask, logits, NEG_INF)
            attn = jax.nn.softmax(logits, axis=-1)
            score = jnp.einsum("bhij,bhjk->bhik", attn, v)  # (B, H, T, d)

        heads = jnp.transpose(score, (0, 2, 1, 3)).reshape(b, t, self.num_heads * d)
        out = heads @ w_o  # (B, T, d)

        net = nn.LayerNorm(name="ln1")(out + x)
        ffn = Dense(d, name="ffn")(net)
        ffn = leakyrelu(ffn)
        return nn.LayerNorm(name="ln2")(ffn + net)
