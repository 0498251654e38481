"""PAD-compacted sequence-gradient scatter (ops/compact_scatter.py):
exactness inside the cap contract, the host-side density dispatch that
keeps dense batches exact, and composition into a real train step."""

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


@pytest.mark.parametrize("density", [0.0, 0.1, 0.2])
def test_scatter_grad_matches_full_within_cap(density):
    """Inside the contract (live <= B*T // CAP_DIVISOR) the compact
    scatter is exact vs the full scatter."""
    rng = np.random.default_rng(0)
    b, t = 64, 20
    ids = jnp.asarray(_prefix_ids(rng, b, t, density))
    divisor = cs._divisor_for(t)
    assert int(jnp.sum(cs._live_lens(ids))) <= ids.size // divisor
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
    got = cs.scatter_grad(ids, g, V, cap_divisor=1)
    want = jnp.zeros((V, K)).at[ids.reshape(-1)].add(g.reshape(-1, K))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_batch_fits_compact_flags_dense_batches():
    from recalgorithm_tpu.features.schema import wechat_schema

    schema = wechat_schema()
    seq = schema.sequence[0]
    b = 4096
    n = b * seq.max_length
    assert n >= 16384
    sparse = {seq.name + "_len": np.full((b,), seq.max_length // 8, np.int32)}
    dense = {seq.name + "_len": np.full((b,), seq.max_length, np.int32)}
    assert cs.batch_fits_compact(sparse, schema)
    assert not cs.batch_fits_compact(dense, schema)
    # small batches never engage the compact path -> always "fits"
    small = {seq.name + "_len": np.full((8,), seq.max_length, np.int32)}
    assert cs.batch_fits_compact(small, schema)


def test_batch_fits_compact_without_len_column():
    """A feeder that ships no '*_len' column still gets overflow
    protection: live lengths are counted from the id array itself."""
    from recalgorithm_tpu.features.schema import wechat_schema

    schema = wechat_schema()
    seq = schema.sequence[0]
    b, t = 4096, seq.max_length
    rng = np.random.default_rng(0)
    dense_ids = rng.integers(1, 100, size=(b, t)).astype(np.int32)
    sparse_ids = np.where(np.arange(t)[None, :] < 3, dense_ids, 0)
    assert not cs.batch_fits_compact({seq.name: dense_ids}, schema)
    assert cs.batch_fits_compact({seq.name: sparse_ids}, schema)
    # feature entirely absent -> no lookup to bound
    assert cs.batch_fits_compact({}, schema)


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


def _make_trainer(tmp_path, gen, schema, cfg, flag, name):
    from recalgorithm_tpu.models.din import DIN
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

    model = DIN(config=cfg, schema=schema)
    return Trainer(
        model, cfg.task_names, optimizers.build("sgd", 1e-2),
        TrainerConfig(model_dir=str(tmp_path / name), train_steps=2,
                      save_checkpoints_steps=0, compact_grad_scatter=flag),
    )


def test_train_step_matches_plain_scatter(tmp_path, monkeypatch):
    """DIN steps with compact_grad_scatter on vs off: same loss/params."""
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DINConfig

    monkeypatch.setattr(cs, "MIN_IDS", 0)
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=128)
    results = {}
    for flag in (False, True):
        trainer = _make_trainer(tmp_path, gen, schema, cfg, flag, str(flag))
        state = trainer.init_state(gen.batch(128, 0))
        trainer._compile()
        for i in range(2):
            hb = gen.batch(128, i)
            state, loss = trainer._train_step_for(hb)(
                state, trainer._put_batch(hb), jax.random.key(0, impl="rbg"))
        results[flag] = (float(loss), state.params)
    assert np.isclose(results[False][0], results[True][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device CPU mesh")
def test_mesh_train_step_matches_plain_scatter(tmp_path, monkeypatch):
    """Compact scatter composes with a single-process mesh: the SPMD
    partitioner shards the compact bookkeeping, and the step matches the
    plain-scatter mesh step exactly."""
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DIN, DINConfig
    from recalgorithm_tpu.parallel import mesh as mesh_lib
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

    monkeypatch.setattr(cs, "MIN_IDS", 0)
    gen = SyntheticWeChat(wechat_schema(),
                          SyntheticConfig(seed=5, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=64)
    mesh = mesh_lib.make_mesh(num_model=2)
    results = {}
    for flag in (False, True):
        model = DIN(config=cfg, schema=schema)
        trainer = Trainer(
            model, cfg.task_names, optimizers.build("sgd", 1e-2),
            TrainerConfig(model_dir=str(tmp_path / str(flag)), train_steps=2,
                          save_checkpoints_steps=0,
                          compact_grad_scatter=flag),
            mesh=mesh,
        )
        assert trainer._use_compact is flag  # mesh no longer gates it off
        state = trainer.init_state(gen.batch(64, 0))
        trainer._compile()
        for i in range(2):
            hb = gen.batch(64, i)
            state, loss = trainer._train_step_for(hb)(
                state, trainer._put_batch(hb), jax.random.key(0, impl="rbg"))
        results[flag] = (float(loss), state.params)
    assert np.isclose(results[False][0], results[True][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dense_batch_dispatches_to_plain_step(tmp_path, monkeypatch):
    """A batch whose sequences overflow the compact buffer routes to the
    plain-scatter executable and still trains exactly."""
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DINConfig

    monkeypatch.setattr(cs, "MIN_IDS", 0)
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=6, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=64)
    dense_batch = gen.batch(64, 0)
    for f in schema.sequence:
        t = f.max_length
        rng = np.random.default_rng(1)
        dense_batch[f.name] = rng.integers(
            1, 50, size=(64, t)).astype(np.int32)
        dense_batch[f.name + "_len"] = np.full((64,), t, np.int32)

    trainer = _make_trainer(tmp_path, gen, schema, cfg, True, "dense")
    state = trainer.init_state(dense_batch)
    trainer._compile()
    fn = trainer._train_step_for(dense_batch)
    assert fn is trainer._train_jit_plain
    assert trainer._train_step_for(gen.batch(64, 1)) is trainer._train_jit

    # and the plain path really is exact on the dense batch
    trainer_off = _make_trainer(tmp_path, gen, schema, cfg, False, "off")
    state_off = trainer_off.init_state(dense_batch)
    trainer_off._compile()
    key = jax.random.key(0, impl="rbg")
    _, loss = fn(state, trainer._put_batch(dense_batch), key)
    _, loss_off = trainer_off._train_jit(
        state_off, trainer_off._put_batch(dense_batch), key)
    assert np.isclose(float(loss), float(loss_off), rtol=1e-6)


def test_agreed_all_reduces_elementwise():
    """agreed_all: global AND per window position, short windows padded with
    True so the collective shape stays static (injectable reduce)."""
    from recalgorithm_tpu.parallel.multihost import agreed_all

    other = np.array([1, 0, 1, 1, 1, 1, 1, 1], np.int32)  # simulated host 2
    seen = {}

    def reduce_fn(a):
        seen["shape"] = a.shape
        return np.minimum(a, other)

    got = agreed_all([True, True, False], window=8, reduce_fn=reduce_fn)
    assert seen["shape"] == (8,)  # padded to the static window
    np.testing.assert_array_equal(got, [True, False, False])


def test_dispatch_steps_multiprocess_agreement(tmp_path, monkeypatch):
    """Multi-process executable dispatch: a batch another host flags as
    dense must route to the plain step HERE too, even when the local check
    says it fits (divergent executables deadlock inside collectives)."""
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DINConfig
    from recalgorithm_tpu.parallel import multihost

    monkeypatch.setattr(cs, "MIN_IDS", 0)
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=6, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=64)
    trainer = _make_trainer(tmp_path, gen, schema, cfg, True, "mp_dispatch")
    trainer._compile()

    # pretend we are process 0 of 2 and the OTHER host flags batch 1 dense
    import recalgorithm_tpu.train.loop as loop_mod

    monkeypatch.setattr(loop_mod.jax, "process_count", lambda: 2)
    other = np.array([1, 0, 1, 1], np.int32)
    monkeypatch.setattr(
        multihost, "agreed_all",
        lambda flags, window=None, reduce_fn=None: (
            np.minimum(np.asarray(flags, np.int32), other[: len(flags)])
            .astype(bool)
        ),
    )
    batches = [gen.batch(64, i) for i in range(4)]  # all locally sparse
    chosen = [fn for _, fn in trainer._dispatch_steps(iter(batches), window=4)]
    assert chosen[0] is trainer._train_jit
    assert chosen[1] is trainer._train_jit_plain  # other host's veto
    assert chosen[2] is trainer._train_jit
    assert chosen[3] is trainer._train_jit
