"""Unit tests for interaction kernels against small NumPy oracles.

Shapes/cases mirror the reference's inline smoke tests (din_attention.py:46-61,
transformer_layer.py:84-101, custom_grucell.py:170-196), plus explicit-loop
oracles for every pooled/pairwise kernel.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recalgorithm_tpu.ops import interactions as I
from recalgorithm_tpu.ops.attention import DINAttention, BSTTransformerBlock
from recalgorithm_tpu.ops.recurrent import GRULoop
from recalgorithm_tpu.ops.experts import ExpertGroup, SoftmaxGate, mix_experts

B, F, K = 4, 5, 8


@pytest.fixture
def field_emb():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, F, K)).astype(np.float32))


def test_fm_pool_matches_pair_sum(field_emb):
    """FM sum-square identity == explicit sum over pairs of v_i*v_j."""
    got = I.fm_pool(field_emb)
    x = np.asarray(field_emb)
    want = np.zeros((B, K), np.float32)
    for i, j in itertools.combinations(range(F), 2):
        want += x[:, i, :] * x[:, j, :]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pairwise_hadamard_order(field_emb):
    got = np.asarray(I.pairwise_hadamard(field_emb))
    x = np.asarray(field_emb)
    pairs = list(itertools.combinations(range(F), 2))
    assert got.shape == (B, len(pairs), K)
    for p, (i, j) in enumerate(pairs):
        np.testing.assert_allclose(got[:, p, :], x[:, i, :] * x[:, j, :], rtol=1e-5)


def test_pairwise_dot(field_emb):
    got = np.asarray(I.pairwise_dot(field_emb))
    x = np.asarray(field_emb)
    pairs = list(itertools.combinations(range(F), 2))
    for p, (i, j) in enumerate(pairs):
        np.testing.assert_allclose(
            got[:, p], np.sum(x[:, i, :] * x[:, j, :], -1), rtol=1e-4, atol=1e-4
        )


def test_cross_network_formula():
    d = 6
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    net = I.CrossNetwork(num_layers=2)
    params = net.init(jax.random.key(0), x0)
    got = np.asarray(net.apply(params, x0))
    p = jax.tree.map(np.asarray, params["params"])
    xl = np.asarray(x0)
    for layer in range(2):
        w, bias = p[f"w_{layer}"], p[f"b_{layer}"]
        xl = np.asarray(x0) * (xl @ w) + bias[:, 0] + xl
    np.testing.assert_allclose(got, xl, rtol=1e-5, atol=1e-5)


def test_cin_layer_against_loops(field_emb):
    h_next = 3
    layer = I.CINLayer(num_feature_maps=h_next)
    xk = field_emb[:, :4, :]  # pretend previous layer has h_k=4 maps
    params = layer.init(jax.random.key(0), field_emb, xk)
    got = np.asarray(layer.apply(params, field_emb, xk))
    filt = np.asarray(params["params"]["filter"])  # (hk*m, h_next)
    x0, xkn = np.asarray(field_emb), np.asarray(xk)
    hk, m = xkn.shape[1], x0.shape[1]
    want = np.zeros((B, h_next, K), np.float32)
    for b in range(B):
        for d in range(K):
            outer = np.outer(xkn[b, :, d], x0[b, :, d]).reshape(hk * m)
            want[b, :, d] = outer @ filt
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_senet_shapes_and_reweighting(field_emb):
    net = I.SENet(reduction_ratio=2)
    params = net.init(jax.random.key(0), field_emb)
    out = net.apply(params, field_emb)
    assert out.shape == (B, F, K)
    # each field is a scalar multiple of the input field
    ratio = np.asarray(out) / (np.asarray(field_emb) + 1e-12)
    np.testing.assert_allclose(ratio.std(axis=-1), 0.0, atol=1e-4)


@pytest.mark.parametrize("itype", ["all", "each", "interaction"])
def test_bilinear_types(field_emb, itype):
    net = I.BilinearInteraction(interaction_type=itype, drop_last_field=False)
    params = net.init(jax.random.key(0), field_emb)
    out = net.apply(params, field_emb)
    assert out.shape == (B, F * (F - 1) // 2, K)


def test_bilinear_reference_parity_pair_count(field_emb):
    net = I.BilinearInteraction(interaction_type="all", drop_last_field=True)
    params = net.init(jax.random.key(0), field_emb)
    out = net.apply(params, field_emb)
    f_eff = F - 1
    assert out.shape == (B, f_eff * (f_eff - 1) // 2, K)


def test_din_attention_zero_length_rows():
    """Reference smoke case (din_attention.py:52): lengths [0, 1]."""
    rng = np.random.default_rng(2)
    keys = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    lengths = jnp.asarray([0, 1], jnp.int32)
    for use_softmax in (False, True):
        att = DINAttention(use_softmax=use_softmax)
        params = att.init(jax.random.key(0), query, keys, lengths)
        out = np.asarray(att.apply(params, query, keys, lengths))
        assert out.shape == (2, 4)
        if not use_softmax:
            # zero-length row pools nothing
            np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
        assert np.all(np.isfinite(out))


def test_bst_block_masks_padding():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    lengths = jnp.asarray([1, 3], jnp.int32)
    block = BSTTransformerBlock(num_heads=3, max_length=5)
    params = block.init(jax.random.key(0), x, lengths)
    out = block.apply(params, x, lengths)
    assert out.shape == (2, 3, 4)
    # changing a padded position must not change valid outputs of row 0
    x2 = x.at[0, 2, :].set(99.0)
    out2 = block.apply(params, x2, lengths)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(out2[0, 0]), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("cell", ["GRU", "AGRU", "AUGRU"])
def test_gru_loop_matches_manual_step(cell):
    b, t, i, h = 3, 4, 5, 6
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(b, t, i)).astype(np.float32))
    lengths = jnp.asarray([4, 2, 0], jnp.int32)
    att = jnp.asarray(rng.random((b, t)).astype(np.float32))
    loop = GRULoop(num_units=h, cell_type=cell)
    params = loop.init(jax.random.key(0), x, lengths, att)
    outs, final = loop.apply(params, x, lengths, att)
    assert outs.shape == (b, t, h) and final.shape == (b, h)

    p = jax.tree.map(np.asarray, params["params"])
    xn, attn = np.asarray(x), np.asarray(att)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    state = np.zeros((b, h), np.float32)
    want_outs = np.zeros((b, t, h), np.float32)
    for step in range(t):
        gates = sigmoid(
            xn[:, step] @ p["w_x_gates"] + state @ p["w_h_gates"] + p["b_gates"]
        )
        r, u = gates[:, :h], gates[:, h:]
        c = np.tanh(
            xn[:, step] @ p["w_x_cand"] + (r * state) @ p["w_h_cand"] + p["b_cand"]
        )
        a = attn[:, step][:, None]
        if cell == "GRU":
            new_h = u * state + (1 - u) * c
        elif cell == "AGRU":
            new_h = (1 - a) * state + a * c
        else:
            u2 = (1 - a) * u
            new_h = u2 * state + (1 - u2) * c
        m = (step < np.asarray(lengths)).astype(np.float32)[:, None]
        state = m * new_h + (1 - m) * state
        want_outs[:, step] = m * new_h
    np.testing.assert_allclose(np.asarray(outs), want_outs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(final), state, rtol=1e-4, atol=1e-4)
    # zero-length row: all-zero outputs, zero final state
    np.testing.assert_allclose(np.asarray(outs[2]), 0.0, atol=1e-6)


def test_expert_group_equals_per_expert_dense():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, 7)).astype(np.float32))
    group = ExpertGroup(num_experts=3, hidden_units=6)
    params = group.init(jax.random.key(0), x)
    out = np.asarray(group.apply(params, x))
    w = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    for e in range(3):
        want = np.maximum(np.asarray(x) @ w[e] + bias[e], 0.0)
        # default (MXU/bf16-grade) matmul precision is intentional here: the
        # expert einsum is the hot matmul of MMOE/PLE
        np.testing.assert_allclose(out[:, e, :], want, rtol=1e-2, atol=1e-2)


def test_gate_mixture_is_convex_combination():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(B, 7)).astype(np.float32))
    experts = jnp.asarray(rng.normal(size=(B, 3, 6)).astype(np.float32))
    gate_mod = SoftmaxGate(num_experts=3)
    params = gate_mod.init(jax.random.key(0), x)
    gate = gate_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(gate).sum(-1), 1.0, rtol=1e-5)
    mixed = np.asarray(mix_experts(experts, gate))
    lo = np.asarray(experts).min(axis=1) - 1e-5
    hi = np.asarray(experts).max(axis=1) + 1e-5
    assert np.all(mixed >= lo) and np.all(mixed <= hi)


def test_cross_network_v2_formula():
    """DCN-v2 (beyond-reference): x_{l+1} = x0 * (W x_l + b) + x_l, both
    full-rank and low-rank factorised."""
    d = 6
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    # full-rank
    net = I.CrossNetworkV2(num_layers=2)
    params = net.init(jax.random.key(0), x0)
    got = np.asarray(net.apply(params, x0))
    p = jax.tree.map(np.asarray, params["params"])
    xl = np.asarray(x0)
    for layer in range(2):
        xl = np.asarray(x0) * (xl @ p[f"w_{layer}"] + p[f"b_{layer}"]) + xl
    np.testing.assert_allclose(got, xl, rtol=1e-5, atol=1e-5)
    # low-rank: W = U V^T
    net = I.CrossNetworkV2(num_layers=1, low_rank=3)
    params = net.init(jax.random.key(1), x0)
    got = np.asarray(net.apply(params, x0))
    p = jax.tree.map(np.asarray, params["params"])
    want = np.asarray(x0) * (np.asarray(x0) @ p["v_0"] @ p["u_0"].T + p["b_0"]) + np.asarray(x0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interacting_layer_oracle(field_emb):
    """AutoInt (beyond-reference): per-head softmax field attention with
    residual projection, against an explicit per-head numpy loop."""
    h, d = 2, 3
    layer = I.InteractingLayer(num_heads=h, head_dim=d)
    params = layer.init(jax.random.key(0), field_emb)
    got = np.asarray(layer.apply(params, field_emb))
    p = jax.tree.map(np.asarray, params["params"])
    x = np.asarray(field_emb)
    outs = []
    for head in range(h):
        sl = slice(head * d, (head + 1) * d)
        q = x @ p["w_query"][:, sl]   # (B, F, d)
        k = x @ p["w_key"][:, sl]
        v = x @ p["w_value"][:, sl]
        scores = np.einsum("bfd,bgd->bfg", q, k)
        e = np.exp(scores - scores.max(axis=-1, keepdims=True))
        att = e / e.sum(axis=-1, keepdims=True)
        outs.append(np.einsum("bfg,bgd->bfd", att, v))
    want = np.concatenate(outs, axis=-1) + x @ p["w_res"]
    want = np.maximum(want, 0.0)
    assert got.shape == (B, F, h * d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mask_block_oracle():
    """MaskNet (beyond-reference): instance-guided mask -> bias-free dense
    -> LayerNorm -> relu, against an explicit numpy recomputation."""
    rng = np.random.default_rng(3)
    hidden = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    mask_in = jnp.asarray(rng.normal(size=(B, 14)).astype(np.float32))
    block = I.MaskBlock(output_size=6, agg_size=12)
    params = block.init(jax.random.key(0), hidden, mask_in)
    got = np.asarray(block.apply(params, hidden, mask_in))
    p = jax.tree.map(np.asarray, params["params"])
    agg = np.maximum(
        np.asarray(mask_in) @ p["mask_agg"]["kernel"] + p["mask_agg"]["bias"], 0.0
    )
    mask = agg @ p["mask_proj"]["kernel"] + p["mask_proj"]["bias"]
    out = (mask * np.asarray(hidden)) @ p["hidden"]["kernel"]
    mu = out.mean(axis=-1, keepdims=True)
    var = out.var(axis=-1, keepdims=True)
    ln = (out - mu) / np.sqrt(var + 1e-6) * p["ln"]["scale"] + p["ln"]["bias"]
    want = np.maximum(ln, 0.0)
    assert got.shape == (B, 6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilinear_fusion_oracle():
    """FinalMLP (beyond-reference): multi-head bilinear aggregation
    b + w1.o1 + w2.o2 + sum_k o1_k^T W_k o2_k against a per-head loop."""
    rng = np.random.default_rng(4)
    o1 = jnp.asarray(rng.normal(size=(B, 6)).astype(np.float32))
    o2 = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    fusion = I.BilinearFusion(num_heads=2)
    params = fusion.init(jax.random.key(0), o1, o2)
    # w3 is zero-initialised (saturation guard) — plant real values so the
    # oracle exercises the bilinear path
    params = jax.tree.map(lambda x: x, params)  # unfreeze-safe shallow copy
    params["params"]["w3"] = jnp.asarray(
        rng.normal(size=params["params"]["w3"].shape).astype(np.float32)
    )
    got = np.asarray(fusion.apply(params, o1, o2))
    p = jax.tree.map(np.asarray, params["params"])
    a, b_ = np.asarray(o1), np.asarray(o2)
    want = p["bias"][0] + (a @ p["w1"])[:, 0] + (b_ @ p["w2"])[:, 0]
    for k in range(2):
        ah, bh = a[:, k * 3:(k + 1) * 3], b_[:, k * 2:(k + 1) * 2]
        want = want + np.einsum("bd,de,be->b", ah, p["w3"][k], bh)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError):
        I.BilinearFusion(num_heads=4).init(jax.random.key(0), o1, o2)


def test_gated_cross_network_formula():
    """GDCN (beyond-reference, CIKM'23): x_{l+1} = x0 * (W x_l + b) *
    sigmoid(G x_l) + x_l."""
    d = 6
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    net = I.CrossNetworkV2(num_layers=2, gated=True)
    params = net.init(jax.random.key(0), x0)
    got = np.asarray(net.apply(params, x0))
    p = jax.tree.map(np.asarray, params["params"])

    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    xl = np.asarray(x0)
    for layer in range(2):
        cross = np.asarray(x0) * (xl @ p[f"w_{layer}"] + p[f"b_{layer}"])
        xl = cross * sigmoid(xl @ p[f"g_{layer}"]) + xl
    np.testing.assert_allclose(got, xl, rtol=1e-5, atol=1e-5)
    # the gate is a real param: ungated differs
    ungated = np.asarray(
        I.CrossNetworkV2(num_layers=2).apply(
            {"params": {k: v for k, v in p.items() if not k.startswith("g_")}},
            x0,
        )
    )
    assert not np.allclose(got, ungated)


def test_interacting_layer_fused_matches_plain():
    """The Pallas fused path (interpret mode on CPU) must equal the plain
    einsum path on the SAME params — value AND gradient — including the
    kernel-layout chaining used by AutoInt's stacked layers (round-4 perf
    fix: plain path pads 9-wide minor dims to 128 lanes, measured 3x slower
    than the fused kernel at batch 4096)."""
    h, d, B_, F_, K_ = 2, 16, 16, 9, 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B_, F_, K_)).astype(np.float32))
    plain = I.InteractingLayer(num_heads=h, head_dim=d)
    fused = I.InteractingLayer(num_heads=h, head_dim=d, fused=True,
                               interpret=True)
    # 3 stacked layers: layer 0 takes standard layout, middles chain in
    # kernel layout, last returns standard — exactly AutoInt's wiring
    ps = [plain.init(jax.random.key(i),
                     x if i == 0 else jnp.zeros((B_, F_, h * d)))
          for i in range(3)]

    def stack_plain(x):
        for i in range(3):
            x = plain.apply(ps[i], x)
        return x

    def stack_fused(x):
        for i in range(3):
            x = fused.apply(ps[i], x, kernel_in=i > 0, kernel_out=i < 2)
        return x

    a, b = stack_plain(x), stack_fused(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    ga = jax.grad(lambda xx: jnp.sum(stack_plain(xx) ** 2))(x)
    gb = jax.grad(lambda xx: jnp.sum(stack_fused(xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-3, atol=1e-3)
