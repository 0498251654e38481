"""Multi-device tests on the faked 8-device CPU mesh (SURVEY.md §4c).

Asserts sharded-vs-single-device numerical equivalence of the pjit'd train
step with row-sharded embedding tables, and that the dryrun_multichip driver
hook executes.
"""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.deep_crossing import DeepCrossing, DeepCrossingConfig
from recalgorithm_tpu.parallel import mesh as mesh_lib
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _trainer(mesh, model_dir):
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepCrossingConfig(batch_size=32, train_steps=3)
    model = DeepCrossing(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 1e-2),
        TrainerConfig(model_dir=model_dir, train_steps=3, save_checkpoints_steps=0),
        mesh=mesh,
    )
    return trainer, gen


def test_sharded_matches_single_device(tmp_path):
    mesh = mesh_lib.make_mesh(num_model=2)
    results = {}
    for name, m in [("single", None), ("sharded", mesh)]:
        trainer, gen = _trainer(m, str(tmp_path / name))
        state = trainer.init_state(gen.batch(32, 0))
        trainer._compile()
        losses = []
        rng = jax.random.key(0)
        for i in range(3):
            batch = trainer._put_batch(gen.batch(32, i))
            rng, sub = jax.random.split(rng)
            state, loss = trainer._train_jit(state, batch, sub)
            losses.append(float(loss))
        results[name] = (losses, state)

    np.testing.assert_allclose(
        results["single"][0], results["sharded"][0], rtol=2e-3, atol=2e-3
    )
    # params equivalent after 3 steps
    single_p = jax.tree.leaves(results["single"][1].params)
    sharded_p = jax.tree.leaves(results["sharded"][1].params)
    for a, b in zip(single_p, sharded_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
        )


def test_tables_actually_sharded(tmp_path):
    mesh = mesh_lib.make_mesh(num_model=1)
    trainer, gen = _trainer(mesh, str(tmp_path))
    state = trainer.init_state(gen.batch(32, 0))
    table = state.params["FieldEmbedder_0"]["embed"]["feedid"]
    # row-sharded over all 8 devices
    assert len(table.sharding.device_set) == 8
    shard_rows = {s.data.shape[0] for s in table.addressable_shards}
    assert all(r < table.shape[0] for r in shard_rows)
    # dense params replicated
    dense_kernel = jax.tree.leaves(state.params["res_0"])[0]
    assert dense_kernel.sharding.is_fully_replicated


def test_dryrun_multichip_hook():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# Explicit shard_map embedding exchange, wired into the training path
# (TrainerConfig.shard_map_embeddings / --shard_map_embeddings)
# ---------------------------------------------------------------------------


def _exchange_trainer(model_name, mesh, model_dir, shard_map_embeddings):
    from recalgorithm_tpu.models import MODEL_REGISTRY

    # vocab_scale large enough that feedid/authorid tables exceed the
    # dense-lookup threshold -> the gather path (and the exchange) engages
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=9, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY[model_name]
    cfg = cfg_cls(batch_size=32, train_steps=4)
    model = model_cls(config=cfg, schema=schema)
    # SGD keeps the comparison meaningful: adaptive optimizers normalise by
    # sqrt(second moment) and blow ~1e-9 fp reduction-order noise in
    # near-zero embedding grads up to full-lr sign flips.
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("sgd", 1e-2),
        TrainerConfig(model_dir=model_dir, train_steps=4,
                      save_checkpoints_steps=0,
                      shard_map_embeddings=shard_map_embeddings),
        mesh=mesh,
    )
    return trainer, gen


@pytest.mark.parametrize("model_name", ["DIN", "FFM"])
def test_shard_map_exchange_matches_auto(tmp_path, model_name):
    """One flag flips between partitioner-derived and explicit collectives;
    losses and params stay numerically identical (VERDICT round-1 item 2)."""
    mesh = mesh_lib.make_mesh(num_model=2)
    results = {}
    for name, flag in [("auto", False), ("shardmap", True)]:
        trainer, gen = _exchange_trainer(model_name, mesh,
                                         str(tmp_path / name), flag)
        state = trainer.init_state(gen.batch(32, 0))
        trainer._compile()
        losses = []
        rng = jax.random.key(0)
        for i in range(4):
            batch = trainer._put_batch(gen.batch(32, i))
            rng, sub = jax.random.split(rng)
            state, loss = trainer._train_jit(state, batch, sub)
            losses.append(float(loss))
        results[name] = (losses, state)
    np.testing.assert_allclose(
        results["auto"][0], results["shardmap"][0], rtol=1e-4, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(results["auto"][1].params),
                    jax.tree.leaves(results["shardmap"][1].params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_shard_map_exchange_emits_collectives(tmp_path):
    """The pinned schedule really is in the compiled module: the id
    all-gather and the psum_scatter (reduce-scatter) of the exchange."""
    mesh = mesh_lib.make_mesh(num_model=2)
    trainer, gen = _exchange_trainer("DIN", mesh, str(tmp_path), True)
    state = trainer.init_state(gen.batch(32, 0))
    trainer._compile()
    batch = trainer._put_batch(gen.batch(32, 0))
    hlo = (
        trainer._train_jit.lower(state, batch, jax.random.key(0))
        .compile().as_text()
    )
    assert "all-gather" in hlo
    assert "reduce-scatter" in hlo


# ---------------------------------------------------------------------------
# Expert parallelism + the "hard" models on the mesh (VERDICT round-1 item 3/8)
# ---------------------------------------------------------------------------


def _mesh_vs_single(model_name, tmp_path, optimizer_fn, num_model=2, steps=3,
                    cfg_overrides=None, vocab_scale=0.01):
    from recalgorithm_tpu.models import MODEL_REGISTRY

    gen = SyntheticWeChat(wechat_schema(),
                          SyntheticConfig(seed=11, vocab_scale=vocab_scale))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY[model_name]
    cfg = cfg_cls(batch_size=32, train_steps=steps, **(cfg_overrides or {}))
    results = {}
    for name, m in [("single", None),
                    ("mesh", mesh_lib.make_mesh(num_model=num_model))]:
        model = model_cls(config=cfg, schema=schema)
        trainer = Trainer(
            model, cfg.task_names, optimizer_fn(model_cls),
            TrainerConfig(model_dir=str(tmp_path / name), train_steps=steps,
                          save_checkpoints_steps=0),
            mesh=m,
        )
        state = trainer.init_state(gen.batch(32, 0))
        trainer._compile()
        losses = []
        rng = jax.random.key(0)
        for i in range(steps):
            batch = trainer._put_batch(gen.batch(32, i))
            rng, sub = jax.random.split(rng)
            state, loss = trainer._train_jit(state, batch, sub)
            losses.append(float(loss))
        results[name] = (losses, state)
    np.testing.assert_allclose(
        results["single"][0], results["mesh"][0], rtol=2e-3, atol=2e-3
    )
    return results


def test_expert_parallelism_matches_single(tmp_path):
    """MMOE with expert kernels sharded over the model axis: same losses as
    single-device, and the (E, in, H) kernel really spans the model axis."""
    results = _mesh_vs_single(
        "MMOE", tmp_path, lambda _: optimizers.build("sgd", 1e-2),
        cfg_overrides={"num_experts": 4, "expert_hidden_units": 32,
                       "hidden_units": (16,), "dropout_rate": 0.0},
    )
    kernel = results["mesh"][1].params["experts"]["kernel"]
    assert kernel.shape[0] == 4
    spec = kernel.sharding.spec
    assert spec[0] == "model", spec
    # 2 model shards x 4 data replicas -> shards hold E/2 experts each
    shard_E = {s.data.shape[0] for s in kernel.addressable_shards}
    assert shard_E == {2}, shard_E


def test_ple_on_mesh_matches_single(tmp_path):
    _mesh_vs_single(
        "PLE", tmp_path, lambda _: optimizers.build("sgd", 1e-2),
        cfg_overrides={"num_experts_per_task": (2, 2, 2),
                       "num_experts_in_shared": 4,
                       "expert_hidden_units": 16, "hidden_units": (16,),
                       "dropout_rate": 0.0},
    )


def test_wide_deep_dual_optimizer_on_mesh(tmp_path):
    """FTRL(wide) + Adam(deep) multi_transform on sharded params
    (the dual-optimizer path was never mesh-tested in round 1)."""
    _mesh_vs_single(
        "WideAndDeep", tmp_path,
        lambda model_cls: optimizers.dual_wide_deep(
            0.005, "adam", 0.001, model_cls.wide_param_predicate
        ),
        cfg_overrides={"hidden_units": (32,), "batch_norm": False,
                       "cross_hash_buckets": 4096},
    )


def test_non_divisible_experts_fall_back_to_replicated(tmp_path):
    """MMOE's default num_experts=3 on a model=2 mesh must keep working:
    device_put rejects uneven NamedShardings, so the expert rule falls back
    to replication when E doesn't divide the axis."""
    from recalgorithm_tpu.models import MODEL_REGISTRY

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=2, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY["MMOE"]
    cfg = cfg_cls(batch_size=32, num_experts=3, expert_hidden_units=16,
                  hidden_units=(16,))
    model = model_cls(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("sgd", 1e-2),
        TrainerConfig(model_dir=str(tmp_path), train_steps=1,
                      save_checkpoints_steps=0),
        mesh=mesh_lib.make_mesh(num_model=2),
    )
    state = trainer.init_state(gen.batch(32, 0))  # crashed before the fix
    kernel = state.params["experts"]["kernel"]
    assert kernel.sharding.is_fully_replicated  # fallback, not sharded
    trainer._compile()
    _, loss = trainer._train_jit(state, trainer._put_batch(gen.batch(32, 0)),
                                 jax.random.key(0))
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip_on_mesh(tmp_path):
    """Orbax save + restore-from-latest with row-sharded tables and the
    dual FTRL/Adam optimizer state on the 8-device mesh."""
    from recalgorithm_tpu.models import MODEL_REGISTRY
    from recalgorithm_tpu.train.loop import _Checkpointer

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=13, vocab_scale=0.01))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY["WideAndDeep"]
    cfg = cfg_cls(batch_size=32, hidden_units=(16,), batch_norm=False,
                  cross_hash_buckets=4096)
    mesh = mesh_lib.make_mesh(num_model=2)

    def make_trainer():
        model = model_cls(config=cfg, schema=schema)
        opt = optimizers.dual_wide_deep(0.005, "adam", 0.001,
                                        model_cls.wide_param_predicate)
        return Trainer(model, cfg.task_names, opt,
                       TrainerConfig(model_dir=str(tmp_path), train_steps=2,
                                     save_checkpoints_steps=0),
                       mesh=mesh)

    trainer = make_trainer()
    state = trainer.init_state(gen.batch(32, 0))
    trainer._compile()
    rng = jax.random.key(0)
    for i in range(2):
        rng, sub = jax.random.split(rng)
        state, _ = trainer._train_jit(state, trainer._put_batch(gen.batch(32, i)), sub)
    ck = _Checkpointer(str(tmp_path), keep_best=1, mesh=mesh)
    ck.save(state)
    ck.close()

    trainer2 = make_trainer()
    fresh = trainer2.init_state(gen.batch(32, 0))
    ck2 = _Checkpointer(str(tmp_path), keep_best=1, mesh=mesh)
    restored = ck2.restore_latest(fresh)
    ck2.close()
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # FTRL z/n state (the multi_transform leaf) survives the round trip
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        if hasattr(a, "shape"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # and training continues from the restored state without retracing issues
    rng, sub = jax.random.split(rng)
    trainer2._compile()
    cont, loss = trainer2._train_jit(
        restored, trainer2._put_batch(gen.batch(32, 5)), sub)
    assert np.isfinite(float(loss))


def test_predict_collect_on_mesh_preserves_rows(tmp_path):
    """Trainer.predict(collect=...) on a mesh: padded eval batches go in,
    every real row comes back exactly once with row-aligned metadata — the
    in-process twin of the 2-process CLI eval/predict regression
    (tests/test_multihost_cli.py)."""
    from recalgorithm_tpu.data import pipeline

    mesh = mesh_lib.make_mesh(num_model=1)
    trainer, gen = _trainer(mesh, str(tmp_path))
    state = trainer.init_state(gen.batch(32, 0))

    # a 3-batch eval pass with a padded tail: 77 real rows, batch 32
    n = 77
    big = gen.batch(128, 7)
    data = pipeline.DatasetArrays(
        dense=big["dense"][:n],
        categorical={k: big[k][:n] for k in
                     ("userid", "feedid", "device", "authorid",
                      "bgm_song_id", "bgm_singer_id")},
        sequences={k: (big[k][:n], big[k + "_len"][:n]) for k in
                   ("his_read_comment_7d_seq", "manual_tag_list")},
        labels=big["labels"][:n],
    )
    probs, collected = trainer.predict(
        state, pipeline.eval_batches(data, 32, index_offset=0),
        collect=("labels", "_index", "userid"),
    )
    assert len(probs["read_comment"]) == n
    order = np.argsort(collected["_index"])
    np.testing.assert_array_equal(collected["_index"][order], np.arange(n))
    np.testing.assert_allclose(
        collected["labels"][order], big["labels"][:n], rtol=1e-6)
    np.testing.assert_array_equal(
        collected["userid"][order].astype(np.int32), big["userid"][:n])
