"""Determinism + multihost helper tests.

The reference relies on single-threaded graph execution for reproducibility;
here we assert the jitted train step is bitwise deterministic under a fixed
seed (JAX/XLA determinism contract) and that the multihost helpers behave in
single-process mode.
"""

import jax
import numpy as np

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.data.stats import compute_stats
from recalgorithm_tpu.data import pipeline
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.features.vocab import VocabularyStore
from recalgorithm_tpu.models.deepfm import DeepFM, DeepFMConfig
from recalgorithm_tpu.parallel import multihost
from recalgorithm_tpu.parallel import mesh as mesh_lib
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig
from tests.test_data import _write_tiny_dataset


def _run(tmp, tag):
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=9, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(batch_size=64, train_steps=5, hidden_units=(16,))
    model = DeepFM(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 1e-2),
        TrainerConfig(model_dir=str(tmp / tag), train_steps=5,
                      save_checkpoints_steps=0, seed=7),
    )
    state = trainer.init_state(gen.batch(64, 0))
    trainer._compile()
    rng = jax.random.key(7)
    losses = []
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, loss = trainer._train_jit(state, trainer._put_batch(gen.batch(64, i)), sub)
        losses.append(float(loss))
    return losses, state


def test_same_seed_bitwise_identical(tmp_path):
    l1, s1 = _run(tmp_path, "a")
    l2, s2 = _run(tmp_path, "b")
    assert l1 == l2  # bitwise
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_shard_range_single_process():
    start, end = multihost.host_shard_range(103)
    assert (start, end) == (0, 103)


def test_global_batch_single_process():
    mesh = mesh_lib.make_mesh()
    local = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = multihost.global_batch(local, mesh, global_batch_size=16)
    assert out["x"].shape == (16, 1)
    assert len(out["x"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out["x"]), local["x"])


def test_stats_reporter(tmp_path):
    path, vocab_dir, _ = _write_tiny_dataset(tmp_path)
    vocabs = VocabularyStore.from_dir(vocab_dir)
    schema = wechat_schema(vocabs.sizes())
    data = pipeline.load_tfrecord_dataset(path, schema, vocabs)
    stats = compute_stats(data, schema)
    assert stats["num_examples"] == 7
    assert 0 <= stats["label_positive_rate"]["read_comment"] <= 1
    assert stats["bgm_song_id_oov_frac"] > 0  # the missing-value row
