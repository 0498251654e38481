"""PAD-compacted sequence-gradient scatter (ops/compact_scatter.py):
exactness vs the full XLA scatter at every density, through grad, and
composed into a real train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recalgorithm_tpu.ops import compact_scatter as cs

V, K = 1024, 16


def _prefix_ids(rng, b, t, density):
    lens = np.minimum(rng.geometric(p=max(1e-6, 1 - density), size=(b,)), t)
    if density == 0.0:
        lens[:] = 0
    if density == 1.0:
        lens[:] = t
    ids = rng.integers(1, V, size=(b, t)).astype(np.int32)
    mask = np.arange(t)[None, :] < lens[:, None]
    return np.where(mask, ids, 0).astype(np.int32)


@pytest.mark.parametrize("density", [0.0, 0.1, 0.5, 1.0])
def test_scatter_grad_matches_full(density):
    rng = np.random.default_rng(0)
    b, t = 64, 20
    ids = jnp.asarray(_prefix_ids(rng, b, t, density))
    g = jnp.asarray(rng.normal(size=(b, t, K)).astype(np.float32))
    g = g * (ids > 0)[..., None]  # engine PAD masking contract
    got = jax.jit(lambda i, gg: cs.scatter_grad(i, gg, V))(ids, g)
    want = jnp.zeros((V, K)).at[ids.reshape(-1)].add(g.reshape(-1, K))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scatter_grad_interior_holes():
    """Masked slots INSIDE the prefix (hashed-cross missing side) stay
    covered — every id>0 entry contributes regardless of hole pattern."""
    ids = jnp.asarray([[5, 0, 7, 0, 0], [0, 3, 0, 0, 9]], jnp.int32)
    g = jnp.where((ids > 0)[..., None],
                  jnp.arange(2 * 5 * K, dtype=jnp.float32).reshape(2, 5, K),
                  0.0)
    got = cs.scatter_grad(ids, g, V)
    want = jnp.zeros((V, K)).at[ids.reshape(-1)].add(g.reshape(-1, K))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_take_compact_bwd_grad_equivalence():
    rng = np.random.default_rng(1)
    b, t = 128, 16
    ids = jnp.asarray(_prefix_ids(rng, b, t, 0.15))
    table = jnp.asarray(rng.normal(size=(V, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    def loss(take):
        def f(tab):
            emb = take(tab, ids) * (ids > 0)[..., None]  # engine masking
            return jnp.sum(jnp.tanh(jnp.sum(emb, axis=1) @ w))
        return f

    g_fast = jax.grad(loss(cs.take_compact_bwd))(table)
    g_ref = jax.grad(loss(
        lambda tab, i: jnp.take(tab, i, axis=0, mode="clip")))(table)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_train_step_matches_plain_scatter(tmp_path, monkeypatch):
    """DIN one step with compact_grad_scatter on vs off: same loss/params."""
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DIN, DINConfig
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

    from recalgorithm_tpu.embed import tables as tables_mod

    monkeypatch.setattr(tables_mod, "COMPACT_SCATTER_MIN_IDS", 0)
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=128)
    results = {}
    for flag in (False, True):
        model = DIN(config=cfg, schema=schema)
        trainer = Trainer(
            model, cfg.task_names, optimizers.build("sgd", 1e-2),
            TrainerConfig(model_dir=str(tmp_path / str(flag)), train_steps=2,
                          save_checkpoints_steps=0,
                          compact_grad_scatter=flag),
        )
        state = trainer.init_state(gen.batch(128, 0))
        trainer._compile()
        for i in range(2):
            state, loss = trainer._train_jit(
                state, trainer._put_batch(gen.batch(128, i)),
                jax.random.key(0, impl="rbg"),
            )
        results[flag] = (float(loss), state.params)
    assert np.isclose(results[False][0], results[True][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
