"""Pallas kernel parity tests (interpreter mode on CPU; TPU-compiled in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recalgorithm_tpu.ops.attention import DINAttention
from recalgorithm_tpu.ops.pallas.din_attention import (
    din_attention_fused,
    din_attention_reference,
)

B, T, H = 32, 50, 16


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    lengths = jnp.asarray(
        np.concatenate([[0, T], rng.integers(0, T + 1, B - 2)]).astype(np.int32)
    )
    att = DINAttention(use_softmax=False)
    params = att.init(jax.random.key(0), q, k, lengths)["params"]
    return q, k, lengths, params


@pytest.mark.parametrize("use_softmax", [False, True])
def test_fused_matches_module(data, use_softmax):
    q, k, lengths, params = data
    att = DINAttention(use_softmax=use_softmax)
    want = np.asarray(att.apply({"params": params}, q, k, lengths))
    got = np.asarray(
        din_attention_fused(
            q, k, lengths, params, use_softmax, 32, True  # interpret mode
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # and the reference recompute used in the backward pass agrees too
    ref = np.asarray(
        din_attention_reference(q, k, lengths, params, use_softmax)
    )
    np.testing.assert_allclose(ref, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_softmax", [False, True])
def test_fused_gradients(data, use_softmax):
    q, k, lengths, params = data

    def loss_fused(q, k, p):
        return jnp.sum(
            din_attention_fused(q, k, lengths, p, use_softmax, 32, True) ** 2
        )

    def loss_plain(q, k, p):
        att = DINAttention(use_softmax=use_softmax)
        return jnp.sum(att.apply({"params": p}, q, k, lengths) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, params)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


def test_fused_module_path(data):
    """DINAttention(fused=True, interpret=True) produces the same param tree."""
    q, k, lengths, params = data
    att = DINAttention(use_softmax=False, fused=True, interpret=True)
    fused_params = att.init(jax.random.key(0), q, k, lengths)["params"]
    assert jax.tree.structure(fused_params) == jax.tree.structure(params)
    out = att.apply({"params": params}, q, k, lengths)
    want = DINAttention(use_softmax=False).apply({"params": params}, q, k, lengths)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# BST fused multi-head attention core
# ---------------------------------------------------------------------------


def test_bst_mha_fused_matches_reference():
    from recalgorithm_tpu.ops.pallas.bst_attention import (
        bst_mha_fused, mha_reference,
    )

    B, H, T, d = 128, 3, 51, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, T + 1, B, dtype=np.int32))

    out = bst_mha_fused(q, k, v, lengths, True)
    want = mha_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    gf = jax.grad(
        lambda q, k, v: jnp.sum(bst_mha_fused(q, k, v, lengths, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(mha_reference(q, k, v, lengths) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gf, gr):
        scale = float(np.abs(np.asarray(b)).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5 * max(scale, 1.0))


def test_bst_mha_fused_bf16_save_grads_close():
    """save_bf16 stores attention probs as bf16: primal bit-exact vs the f32
    path, gradients within bf16 rounding of the reference."""
    from recalgorithm_tpu.ops.pallas.bst_attention import (
        bst_mha_fused, mha_reference,
    )

    B, H, T, d = 128, 3, 51, 16
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, T + 1, B, dtype=np.int32))

    out_bf = bst_mha_fused(q, k, v, lengths, True, True)
    out_f32 = bst_mha_fused(q, k, v, lengths, True, False)
    np.testing.assert_array_equal(np.asarray(out_bf), np.asarray(out_f32))

    gf = jax.grad(
        lambda q, k, v: jnp.sum(bst_mha_fused(q, k, v, lengths, True, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(mha_reference(q, k, v, lengths) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gf, gr):
        scale = float(np.abs(np.asarray(b)).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-2 * max(scale, 1.0))


def test_bst_core_module_path_matches_plain():
    from recalgorithm_tpu.ops.attention import BSTTransformerBlock

    B, T, d = 128, 51, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, T + 1, B, dtype=np.int32))
    plain = BSTTransformerBlock(3, T)
    params = plain.init(jax.random.key(0), x, lengths)
    fused = BSTTransformerBlock(3, T, fused=True, interpret=True)
    assert (jax.tree.structure(fused.init(jax.random.key(0), x, lengths))
            == jax.tree.structure(params))
    out_p = plain.apply(params, x, lengths)
    out_f = fused.apply(params, x, lengths)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-4, atol=1e-4)


def test_bst_kernel_layout_matches_plain():
    """The (H, T*d, B)-layout kernel boundary: same params, same fwd AND
    grads as the plain module path."""
    from recalgorithm_tpu.ops.attention import BSTTransformerBlock

    B, T, d = 96, 51, 16  # non-128 batch exercises the lane padding
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, T + 1, B, dtype=np.int32))
    plain = BSTTransformerBlock(3, T)
    params = plain.init(jax.random.key(0), x, lengths)
    kl = BSTTransformerBlock(3, T, fused=True, interpret=True,
                             kernel_layout=True)
    assert (jax.tree.structure(kl.init(jax.random.key(0), x, lengths))
            == jax.tree.structure(params))
    np.testing.assert_allclose(
        np.asarray(kl.apply(params, x, lengths)),
        np.asarray(plain.apply(params, x, lengths)),
        rtol=1e-4, atol=1e-4,
    )

    def loss(mod):
        def f(p, xx):
            return jnp.sum(mod.apply(p, xx, lengths) ** 2)
        return f

    gp, gx_p = jax.grad(loss(plain), argnums=(0, 1))(params, x)
    gk, gx_k = jax.grad(loss(kl), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_p),
                               rtol=1e-3, atol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        ),
        gk, gp,
    )


def test_bst_mha_fused_odd_batch():
    """Non-128-multiple batches are padded internally (ADVICE round 1)."""
    from recalgorithm_tpu.ops.pallas.bst_attention import (
        bst_mha_fused, mha_reference,
    )

    B, H, T, d = 100, 2, 51, 16
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, T + 1, B, dtype=np.int32))
    out = bst_mha_fused(q, k, v, lengths, True)
    assert out.shape == (B, H, T, d)
    want = mha_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # gradients flow through the pad/slice wrapper
    g = jax.grad(lambda q: jnp.sum(bst_mha_fused(q, k, v, lengths, True) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(mha_reference(q, k, v, lengths) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_din_fused_odd_batch():
    rng = np.random.default_rng(4)
    b = 75
    q = jnp.asarray(rng.normal(size=(b, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, T, H)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(0, T + 1, b, dtype=np.int32))
    att = DINAttention(use_softmax=True)
    params = att.init(jax.random.key(0), q, k, lengths)["params"]
    want = np.asarray(att.apply({"params": params}, q, k, lengths))
    got = np.asarray(
        din_attention_fused(q, k, lengths, params, True, 1024, True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


