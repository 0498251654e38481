"""Feature-interaction kernels for the FM/cross family of CTR models.

These are the compute cores of DeepFM/NFM (sum-square FM pooling), FwFM
(weighted pairwise dots), AFM (attention over pairwise Hadamard products),
PNN (inner/outer product layers), DCN (cross network), xDeepFM (CIN) and
FiBiNET (SENET + bilinear interactions).

Design notes (TPU-first):
  * everything operates on a stacked field-embedding tensor ``(B, F, K)`` —
    batched einsums that XLA tiles straight onto the MXU, instead of the
    reference's Python loops over fields/pairs (e.g. ffm.py:138-160,
    pnn.py:152-173, bilinear_interaction_layer.py:24-38),
  * all pair enumeration uses a static upper-triangular index set
    (``jnp.triu_indices``), replacing algorithm/utils.py:67-82,
  * shapes are static; no data-dependent control flow, so every kernel fuses
    under jit.

Reference formula citations are given per function.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.ops.mlp import Dense, glorot_uniform

# The interaction einsums are tiny (K <= 32, F <= 8) and bandwidth-bound, so
# full f32 accumulation costs nothing while keeping the pairwise terms exact;
# the default (bf16-on-MXU) precision is reserved for the big MLP towers.
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# FM-style pooling
# ---------------------------------------------------------------------------

def fm_pool(field_emb: jax.Array) -> jax.Array:
    """Bi-interaction / FM second-order pooling via the sum-square identity.

    0.5 * ((sum_f v_f)^2 - sum_f v_f^2)   (reference deepfm.py:192-200,
    nfm.py:155-168).

    Args:
      field_emb: (B, F, K) stacked field embeddings.
    Returns:
      (B, K).  DeepFM additionally sums over K for its scalar logit.
    """
    sum_then_sq = jnp.square(jnp.sum(field_emb, axis=1))
    sq_then_sum = jnp.sum(jnp.square(field_emb), axis=1)
    return 0.5 * (sum_then_sq - sq_then_sum)


@functools.lru_cache(maxsize=None)
def _pair_indices(num_fields: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    import numpy as np

    i, j = np.triu_indices(num_fields, k=1)
    return tuple(int(x) for x in i), tuple(int(x) for x in j)


def pairwise_hadamard(field_emb: jax.Array) -> jax.Array:
    """All F(F-1)/2 elementwise pair products, stacked (reference afm.py:160-165).

    (B, F, K) -> (B, P, K) with P = F(F-1)/2, pairs in row-major upper-tri
    order — the same (i, j), i<j order as utils.py:67-82.
    """
    i, j = _pair_indices(field_emb.shape[1])
    return field_emb[:, i, :] * field_emb[:, j, :]


def pairwise_dot(field_emb: jax.Array) -> jax.Array:
    """All pairwise inner products <v_i, v_j>, i<j (FwFM, reference fwfm.py:146-158).

    (B, F, K) -> (B, P).  Computed from the full Gram matrix — one batched
    (B, F, K) @ (B, K, F) MXU matmul — then gathered at the static upper-tri
    positions; O(F^2 K) with no host loops.
    """
    gram = jnp.einsum("bfk,bgk->bfg", field_emb, field_emb, precision=_HI)
    i, j = _pair_indices(field_emb.shape[1])
    return gram[:, i, j]


class AFMAttention(nn.Module):
    """AFM attention over pair products (reference afm.py:167-188).

    score = softmax_pairs(h^T relu(W p_ij + b)); output = P^T score projected
    by p-vector happens in the model; this module returns the attention-
    weighted sum (B, K).
    """

    attention_factor: int

    @nn.compact
    def __call__(self, pair_products: jax.Array) -> jax.Array:  # (B, P, K)
        a = Dense(self.attention_factor, name="attention_w")(pair_products)
        a = nn.relu(a)
        h = self.param("attention_h", glorot_uniform, (self.attention_factor, 1))
        score = jax.nn.softmax(a @ h, axis=1)  # (B, P, 1)
        return jnp.sum(pair_products * score, axis=1)  # (B, K)


# ---------------------------------------------------------------------------
# PNN product layers (reference pnn.py:146-173)
# ---------------------------------------------------------------------------

class InnerProductLayer(nn.Module):
    """IPNN: lp_i = || sum_f theta_{i,f} v_f ||^2 for each of D output units.

    Reference pnn.py:146-158 loops over D; here it is one einsum:
    delta[b,d,k] = sum_f theta[d,f] emb[b,f,k]; lp = sum_k delta^2.
    """

    output_dim: int
    weight_regularizer: float = 0.0

    @nn.compact
    def __call__(self, field_emb: jax.Array) -> jax.Array:  # (B, F, K) -> (B, D)
        num_fields = field_emb.shape[1]
        theta = self.param(
            "inner_product_w", glorot_uniform, (self.output_dim, num_fields)
        )
        if self.weight_regularizer > 0:
            # tf.contrib.layers.l2_regularizer parity: scale * sum(w^2) / 2
            self.sow(
                "losses", "weight_l2",
                0.5 * self.weight_regularizer * jnp.sum(jnp.square(theta)),
            )
        delta = jnp.einsum("df,bfk->bdk", theta, field_emb, precision=_HI)
        return jnp.sum(jnp.square(delta), axis=-1)


class OuterProductLayer(nn.Module):
    """OPNN: lp_i = sum(W_i_sym * p), p = (sum_f v_f)(sum_f v_f)^T.

    Reference pnn.py:160-173 symmetrises each W_i from its upper triangle and
    loops over D; here W is symmetrised in one shot and contracted with a
    single einsum.
    """

    output_dim: int
    weight_regularizer: float = 0.0

    @nn.compact
    def __call__(self, field_emb: jax.Array) -> jax.Array:  # (B, F, K) -> (B, D)
        k = field_emb.shape[-1]
        w = self.param("outer_product_w", glorot_uniform, (self.output_dim, k, k))
        if self.weight_regularizer > 0:
            self.sow(
                "losses", "weight_l2",
                0.5 * self.weight_regularizer * jnp.sum(jnp.square(w)),
            )
        upper = jnp.triu(w)
        w_sym = upper + jnp.swapaxes(upper, -1, -2) - jnp.triu(jnp.tril(w))
        s = jnp.sum(field_emb, axis=1)  # (B, K)
        # sum_{jk} W[d,j,k] s_j s_k  ==  (s W_d) . s
        return jnp.einsum("bj,djk,bk->bd", s, w_sym, s, precision=_HI)


# ---------------------------------------------------------------------------
# DCN cross network (reference cross_layer.py:4-26)
# ---------------------------------------------------------------------------

class CrossNetwork(nn.Module):
    """DCN-v1 stack: x_{l+1} = x0 * (x_l^T w_l) + b_l + x_l."""

    num_layers: int

    @nn.compact
    def __call__(self, x0: jax.Array) -> jax.Array:  # (B, d)
        d = x0.shape[-1]
        xl = x0
        for layer in range(self.num_layers):
            w = self.param(f"w_{layer}", glorot_uniform, (d, 1))
            b = self.param(f"b_{layer}", glorot_uniform, (d, 1))
            xl = x0 * (xl @ w) + b[:, 0] + xl
        return xl


# ---------------------------------------------------------------------------
# xDeepFM CIN (reference cin_layer.py:4-30)
# ---------------------------------------------------------------------------

class CINLayer(nn.Module):
    """One Compressed Interaction Network layer.

    outer[b,k,i,j] = xk[b,i,k] * x0[b,j,k]; compressed along (i, j) with a
    learned (h_k * m, h_next) filter — the reference's 1-D conv over the
    flattened outer product (cin_layer.py:21-29) is exactly this einsum, which
    maps directly onto the MXU.
    """

    num_feature_maps: int

    @nn.compact
    def __call__(self, x0: jax.Array, xk: jax.Array) -> jax.Array:
        # x0: (B, m, K), xk: (B, h_k, K) -> (B, h_next, K)
        m, hk = x0.shape[1], xk.shape[1]
        filters = self.param(
            "filter", glorot_uniform, (hk * m, self.num_feature_maps)
        )
        outer = jnp.einsum("bik,bjk->bkij", xk, x0, precision=_HI)  # (B, K, hk, m)
        outer = outer.reshape(outer.shape[0], outer.shape[1], hk * m)
        out = jnp.einsum("bkf,fh->bhk", outer, filters, precision=_HI)
        return out


# ---------------------------------------------------------------------------
# FiBiNET: SENET + bilinear interaction (reference senet.py, bilinear_*.py)
# ---------------------------------------------------------------------------

class SENet(nn.Module):
    """Squeeze-and-excitation field reweighting (reference senet.py:4-36).

    Note the reference's bottleneck width is ``K // reduction_ratio`` (the
    embedding dim, not the field count — senet.py:19) and it uses relu (not
    sigmoid) on the excitation output; both reproduced here.
    """

    reduction_ratio: int

    @nn.compact
    def __call__(self, field_emb: jax.Array) -> jax.Array:  # (B, F, K)
        num_fields, k = field_emb.shape[1], field_emb.shape[2]
        reduction_dim = max(1, k // self.reduction_ratio)
        w1 = self.param("w1", glorot_uniform, (num_fields, reduction_dim))
        w2 = self.param("w2", glorot_uniform, (reduction_dim, num_fields))
        z = jnp.mean(field_emb, axis=-1)  # (B, F)
        a = nn.relu(nn.relu(z @ w1) @ w2)  # (B, F)
        return field_emb * a[..., None]


class BilinearInteraction(nn.Module):
    """FiBiNET bilinear pair interaction p_ij = (v_i W) * v_j.

    types: 'all' (one shared K x K W), 'each' (per-field W), 'interaction'
    (per-pair W) — reference bilinear_interaction_layer.py:22-38.

    Parity note: the reference enumerates ``combinations(range(F-1), 2)``,
    silently dropping the last field from all pair interactions (an apparent
    off-by-one).  ``drop_last_field=True`` (default) reproduces that exact
    behaviour so AUC baselines remain comparable; set False for the paper's
    full pair set.
    """

    interaction_type: str = "all"
    drop_last_field: bool = True

    @nn.compact
    def __call__(self, field_emb: jax.Array) -> jax.Array:  # (B, F, K) -> (B, P, K)
        num_fields, k = field_emb.shape[1], field_emb.shape[2]
        f_eff = num_fields - 1 if self.drop_last_field else num_fields
        i, j = _pair_indices(f_eff)
        num_pairs = len(i)
        if self.interaction_type == "all":
            w = self.param("w_all", glorot_uniform, (k, k))
            vw = field_emb @ w  # (B, F, K)
            return vw[:, i, :] * field_emb[:, j, :]
        if self.interaction_type == "each":
            w = self.param("w_each", glorot_uniform, (f_eff, k, k))
            # per-left-field matrices (reference allocates F-1 of them)
            vw = jnp.einsum("bpk,pkl->bpl", field_emb[:, i, :], w[jnp.array(i)])
            return vw * field_emb[:, j, :]
        if self.interaction_type == "interaction":
            w = self.param("w_interaction", glorot_uniform, (num_pairs, k, k))
            vw = jnp.einsum("bpk,pkl->bpl", field_emb[:, i, :], w)
            return vw * field_emb[:, j, :]
        raise ValueError(
            f"interaction_type must be all/each/interaction, got {self.interaction_type!r}"
        )


# ---------------------------------------------------------------------------
# Beyond-reference interaction ops (the reference stops at DCN v1 / no
# attention-interaction model): DCN-v2 cross and AutoInt field attention.
# ---------------------------------------------------------------------------

class CrossNetworkV2(nn.Module):
    """DCN-v2 cross stack: ``x_{l+1} = x0 * (W_l x_l + b_l) + x_l``.

    Beyond-reference addition — the reference implements only the v1 rank-1
    cross (cross_layer.py:4-26, CrossNetwork above); this is the full-matrix
    formulation of Wang et al. 2021 (arXiv:2008.13535).  ``low_rank r > 0``
    factorises ``W_l = U_l V_l^T``: two thin (d, r) MXU matmuls instead of
    one (d, d) — the paper's DCN-Mix building block, and the TPU-friendly
    choice once d outgrows a few hundred.

    ``gated=True`` is GDCN's gated cross (Wang et al., CIKM'23,
    arXiv:2311.04635): ``x_{l+1} = x0 * (W_l x_l + b_l) * sigmoid(G_l x_l)
    + x_l`` — the gate learns per-dimension relevance of each cross term.
    """

    num_layers: int
    low_rank: int = 0
    gated: bool = False

    @nn.compact
    def __call__(self, x0: jax.Array) -> jax.Array:  # (B, d)
        d = x0.shape[-1]
        xl = x0
        for layer in range(self.num_layers):
            if self.low_rank > 0:
                u = self.param(f"u_{layer}", glorot_uniform, (d, self.low_rank))
                v = self.param(f"v_{layer}", glorot_uniform, (d, self.low_rank))
                w_xl = (xl @ v) @ u.T
            else:
                w = self.param(f"w_{layer}", glorot_uniform, (d, d))
                w_xl = xl @ w
            b = self.param(f"b_{layer}", nn.initializers.zeros, (d,))
            cross = x0 * (w_xl + b)
            if self.gated:
                g = self.param(f"g_{layer}", glorot_uniform, (d, d))
                cross = cross * jax.nn.sigmoid(xl @ g)
            xl = cross + xl
        return xl


class InteractingLayer(nn.Module):
    """AutoInt multi-head self-attention over FIELDS (not positions).

    Beyond-reference addition, Song et al. 2019 (arXiv:1810.11921 §3.4):
    per head h, score(f, g) = <W_q e_f, W_k e_g> (unscaled inner product,
    as in the paper), softmax over g, heads concatenated, plus a residual
    projection and relu.

    Two execution paths over the (B, F, K) field tensor:

      * plain einsum chain (default): XLA lowers the per-head score/mix
        einsums to (F, d) x (d, F) batched matmuls whose minor dims are 9
        and 16 — every HBM tensor pads its lane dim 9 -> 128 (14x wasted
        bandwidth, measured ~30 GB/s effective on the (B, 2, 9, 9) score
        fusions) plus ~5 ms/step of layout copies at batch 4096,
      * ``fused=True``: the Pallas BST MHA kernel in TRANSPOSED layout —
        batch on the 128-lane axis, (field, dim) on sublanes — with the
        whole softmax(q k^T) v core VMEM-resident.  AutoInt's scores are
        UNSCALED inner products, so q is pre-multiplied by sqrt(d) to
        cancel the kernel's 1/sqrt(d) exactly (d=16 -> x4.0, an exact
        power of two: bit-identical scores).  ``kernel_in``/``kernel_out``
        let stacked layers chain in kernel layout (P, F, d, B) so the
        inter-layer transposes fold into the projection contractions.

    Both paths share the same parameters (checkpoint-interchangeable);
    equivalence is asserted in tests/test_interactions.py.
    """

    num_heads: int
    head_dim: int
    fused: bool = False
    interpret: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kernel_in: bool = False,
        kernel_out: bool = False,
    ) -> jax.Array:  # (B, F, K) -> (B, F, H*d); kernel layout: (H, F, d, B)
        h, d = self.num_heads, self.head_dim
        if kernel_in:
            p, f, dp, b = x.shape
            k_in = p * dp
        else:
            b, f, k_in = x.shape[0], x.shape[1], x.shape[-1]
        wq = self.param("w_query", glorot_uniform, (k_in, h * d))
        wk = self.param("w_key", glorot_uniform, (k_in, h * d))
        wv = self.param("w_value", glorot_uniform, (k_in, h * d))
        wr = self.param("w_res", glorot_uniform, (k_in, h * d))

        if not self.fused:
            assert not (kernel_in or kernel_out), "kernel layout needs fused"
            q = (x @ wq).reshape(b, f, h, d)
            k = (x @ wk).reshape(b, f, h, d)
            v = (x @ wv).reshape(b, f, h, d)
            scores = jnp.einsum("bfhd,bghd->bhfg", q, k, precision=_HI)
            att = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhfg,bghd->bfhd", att, v, precision=_HI)
            return nn.relu(out.reshape(b, f, h * d) + x @ wr)

        from recalgorithm_tpu.ops.pallas.bst_attention import bst_mha_fused_t

        if kernel_in:
            proj = lambda w: jnp.einsum(
                "pfdb,pdhj->hfjb", x, w.reshape(p, dp, h, d), precision=_HI
            )
        else:
            proj = lambda w: jnp.einsum(
                "bfk,khj->hfjb", x, w.reshape(k_in, h, d), precision=_HI
            )
        qT = proj(wq) * (d**0.5)  # cancels the kernel's 1/sqrt(d)
        kT, vT, resT = proj(wk), proj(wv), proj(wr)
        lengths = jnp.full((b,), f, jnp.int32)  # all fields valid: no mask
        outT = bst_mha_fused_t(
            qT.reshape(h, f * d, b), kT.reshape(h, f * d, b),
            vT.reshape(h, f * d, b), lengths, f, self.interpret,
        )
        out4 = nn.relu(outT.reshape(h, f, d, b) + resT)
        if kernel_out:
            return out4
        # (H, F, d, B) -> (B, F, H*d), matching the plain path's head order
        return out4.transpose(3, 1, 0, 2).reshape(b, f, h * d)


class MaskBlock(nn.Module):
    """MaskNet's instance-guided mask block (beyond-reference addition).

    Wang et al. 2021 (arXiv:2102.07619 §3.2-3.3): a two-layer bottleneck
    MLP on the flat input embedding emits a per-instance multiplicative
    mask over the block's hidden input; the masked vector runs a bias-free
    feed-forward layer followed by LayerNorm and relu (LN supplies the
    bias, as in the paper's LN-HID).  All three matmuls are (B, D)-sized
    MXU contractions with static shapes — one fused subgraph under jit.

    ``hidden`` is the vector being masked (the LN'd flat embedding for the
    first block, the previous block's output in serial stacking);
    ``mask_input`` is always the flat field embedding.
    """

    output_size: int
    agg_size: int  # bottleneck width of the mask generator ("aggregation")

    @nn.compact
    def __call__(self, hidden: jax.Array, mask_input: jax.Array) -> jax.Array:
        agg = nn.relu(Dense(self.agg_size, name="mask_agg")(mask_input))
        mask = Dense(hidden.shape[-1], name="mask_proj")(agg)
        out = nn.Dense(
            self.output_size, use_bias=False,
            kernel_init=glorot_uniform, name="hidden",
        )(mask * hidden)
        return nn.relu(nn.LayerNorm(name="ln")(out))


class BilinearFusion(nn.Module):
    """FinalMLP's multi-head bilinear interaction aggregation
    (beyond-reference addition).

    Mao et al. 2023 (arXiv:2304.00902 §3.3): the two stream outputs are
    split into ``num_heads`` chunks and fused per head with a bilinear
    form —  logit = b + w1.o1 + w2.o2 + sum_k o1_k^T W_k o2_k.  The
    bilinear term is one (k, d1, d2) einsum; heads cut its parameter
    count k-fold versus a single full bilinear matrix.
    """

    num_heads: int = 1

    @nn.compact
    def __call__(self, o1: jax.Array, o2: jax.Array) -> jax.Array:  # -> (B,)
        k = self.num_heads
        if o1.shape[-1] % k or o2.shape[-1] % k:
            raise ValueError(
                f"stream dims {o1.shape[-1]}/{o2.shape[-1]} not divisible by"
                f" num_heads={k}"
            )
        d1, d2 = o1.shape[-1] // k, o2.shape[-1] // k
        bias = self.param("bias", nn.initializers.zeros, (1,))
        w1 = self.param("w1", glorot_uniform, (o1.shape[-1], 1))
        w2 = self.param("w2", glorot_uniform, (o2.shape[-1], 1))
        # bilinear tensor starts at zero: a glorot init sums k*d1*d2 products
        # of O(1) activations into the logit (std ~10 at the default stream
        # widths) and saturates every sigmoid at init; zero keeps the fused
        # logit = linear part until the bilinear term earns its weights.
        w3 = self.param("w3", nn.initializers.zeros, (k, d1, d2))
        o1h = o1.reshape(o1.shape[0], k, d1)
        o2h = o2.reshape(o2.shape[0], k, d2)
        bilinear = jnp.einsum("bkd,kde,bke->b", o1h, w3, o2h, precision=_HI)
        return bias[0] + (o1 @ w1)[:, 0] + (o2 @ w2)[:, 0] + bilinear
