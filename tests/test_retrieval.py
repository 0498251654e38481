"""TwoTower retrieval: tower invariants, in-batch-softmax masking, the
brute-force Retriever against a numpy oracle, the per-task loss-weight
trainer hook, and end-to-end learnability.

(Beyond-reference: the reference zoo is ranking-only — no counterpart.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.two_tower import TwoTower, TwoTowerConfig
from recalgorithm_tpu.serving.retrieval import Retriever, brute_force_top_k
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

B = 32

_gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7, vocab_scale=0.002))
SCHEMA = wechat_schema(_gen.vocab_sizes())
BATCH = {k: jnp.asarray(v) for k, v in _gen.batch(B, 0).items()}


def _init(cfg):
    model = TwoTower(config=cfg, schema=SCHEMA)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        BATCH, train=True,
    )
    return model, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }


def test_towers_l2_normalised():
    model, variables = _init(TwoTowerConfig(hidden_units=(32,), output_dim=8))
    u = model.apply(variables, BATCH, train=False, method=model.user_embedding)
    v = model.apply(variables, BATCH, train=False, method=model.item_embedding)
    for vec in (u, v):
        assert vec.shape == (B, 8)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(vec), axis=-1), 1.0, atol=1e-5
        )


def test_in_batch_softmax_matches_oracle_with_collision_mask():
    """The sowed loss equals a hand-computed masked softmax, including the
    same-feedid false-negative mask."""
    cfg = TwoTowerConfig(hidden_units=(32,), output_dim=8)
    model, variables = _init(cfg)
    batch = dict(BATCH)
    # force a duplicate item: row 1 is the same feedid as row 0
    feed = np.asarray(batch["feedid"]).copy()
    feed[1] = feed[0]
    batch["feedid"] = jnp.asarray(feed)

    _, upd = model.apply(batch=batch, train=False, mutable=["losses"],
                         variables=variables)
    (sowed,) = jax.tree.leaves(upd["losses"])

    u = np.asarray(model.apply(variables, batch, method=model.user_embedding))
    v = np.asarray(model.apply(variables, batch, method=model.item_embedding))
    scores = (u @ v.T) / cfg.temperature
    same = feed[:, None] == feed[None, :]
    np.fill_diagonal(same, False)
    scores = np.where(same, -1e9, scores)
    logp = scores - np.log(np.sum(np.exp(scores - scores.max(-1, keepdims=True)),
                                  -1, keepdims=True)) - scores.max(-1, keepdims=True)
    y = np.asarray(batch["labels"][:, SCHEMA.labels.index("read_comment")],
                   np.float32)
    oracle = -np.sum(np.diagonal(logp) * y) / max(y.sum(), 1.0)
    np.testing.assert_allclose(float(sowed), oracle, rtol=1e-4)
    # and the masked entries really are excluded: row 0's logp at column 1
    # (the duplicate) must be ~-inf scale
    assert logp[0, 1] < -1e8 / cfg.temperature * 0 - 100


def test_logq_correction_tracks_frequencies_and_matches_oracle():
    """The streaming item-frequency EMA updates exactly (decay*prior + batch
    histogram) in train mode, stays frozen at inference, and the corrected
    softmax loss equals a hand computation with -log(p_j) on each candidate
    column."""
    cfg = TwoTowerConfig(hidden_units=(32,), output_dim=8,
                         logq_correction=True, freq_decay=0.9)
    model, variables = _init(cfg)
    vocab = SCHEMA.vocab_sizes["feedid"]
    feed = np.asarray(BATCH["feedid"]).reshape(-1)

    # one train-mode step: freq = 0.9 * prior(=1.0) + histogram(feed)
    _, upd = model.apply(variables, BATCH, train=True,
                         rngs={"dropout": jax.random.key(0)},
                         mutable=["batch_stats", "losses"])
    freq = np.asarray(upd["batch_stats"]["feedid_freq"])
    want = 0.9 * np.ones(vocab) + np.bincount(feed, minlength=vocab)
    np.testing.assert_allclose(freq, want, rtol=1e-6)

    # the sowed loss matches an oracle using the POST-update frequencies
    (sowed,) = jax.tree.leaves(upd["losses"])
    u = np.asarray(model.apply(variables, BATCH, method=model.user_embedding))
    v = np.asarray(model.apply(variables, BATCH, method=model.item_embedding))
    scores = (u @ v.T) / cfg.temperature - np.log(freq[feed] / freq.sum())
    same = feed[:, None] == feed[None, :]
    np.fill_diagonal(same, False)
    scores = np.where(same, -1e9, scores)
    m = scores.max(-1, keepdims=True)
    logp = scores - m - np.log(np.sum(np.exp(scores - m), -1, keepdims=True))
    y = np.asarray(BATCH["labels"][:, SCHEMA.labels.index("read_comment")],
                   np.float32)
    oracle = -np.sum(np.diagonal(logp) * y) / max(y.sum(), 1.0)
    np.testing.assert_allclose(float(sowed), oracle, rtol=1e-4)

    # inference mode must not mutate the estimator
    new_vars = {"params": variables["params"],
                "batch_stats": upd["batch_stats"]}
    _, upd2 = model.apply(new_vars, BATCH, train=False, mutable=["losses"])
    assert "batch_stats" not in upd2


def test_retriever_topk_matches_numpy_oracle():
    model, variables = _init(TwoTowerConfig(hidden_units=(32,), output_dim=8))
    retr = Retriever(model, variables)
    item_batches = [
        {k: jnp.asarray(a) for k, a in _gen.batch(B, s).items()}
        for s in (1, 2, 3)
    ]
    n = retr.build_corpus(item_batches)
    assert n == len(set(np.asarray(retr.corpus_ids).tolist()))  # deduped

    ids, scores = retr.retrieve(BATCH, k=5)
    assert ids.shape == scores.shape == (B, 5)
    # oracle: full score matrix from the same towers
    u = np.asarray(model.apply(variables, BATCH, method=model.user_embedding))
    full = u @ np.asarray(retr.corpus).T
    order = np.argsort(-full, axis=-1)[:, :5]
    np.testing.assert_allclose(
        scores, np.take_along_axis(full, order, -1), atol=1e-5
    )
    np.testing.assert_array_equal(ids, retr.corpus_ids[order])
    # scores must be descending
    assert np.all(np.diff(scores, axis=-1) <= 1e-6)

    # a mesh-backed Retriever returns the identical result
    from recalgorithm_tpu.parallel.mesh import make_mesh

    retr_m = Retriever(model, variables, mesh=make_mesh(num_model=2))
    retr_m.corpus, retr_m.corpus_ids = retr.corpus, retr.corpus_ids
    ids_m, scores_m = retr_m.retrieve(BATCH, k=5)
    np.testing.assert_array_equal(ids_m, ids)
    np.testing.assert_allclose(scores_m, scores, rtol=1e-6)


def test_sharded_top_k_matches_single_device():
    """Corpus sharded over the full 8-device (data, model) mesh: the
    local-top-k + all-gather merge returns exactly the single-device
    result, including with a corpus size not divisible by the device count
    (padding rows score -inf) and with k larger than a local shard."""
    from recalgorithm_tpu.parallel.mesh import make_mesh
    from recalgorithm_tpu.serving.retrieval import sharded_top_k

    rng = np.random.default_rng(1)
    mesh = make_mesh(num_model=2)
    for n, k in [(101, 7), (64, 5), (40, 12)]:  # 101 % 8 != 0; 12 > 40/8
        u = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
        want_s, want_i = brute_force_top_k(u, c, k)
        got_s, got_i = sharded_top_k(u, c, k, mesh)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=1e-6
        )


def test_brute_force_top_k_shape_and_exactness():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(50, 8)).astype(np.float32)
    scores, idx = jax.jit(brute_force_top_k, static_argnums=2)(u, c, 3)
    oracle = u @ c.T
    np.testing.assert_array_equal(
        np.asarray(idx), np.argsort(-oracle, -1)[:, :3]
    )


def test_retriever_through_batching_server():
    """Single-user retrieval requests co-batch through BatchingPredictor and
    return each row of the direct batched retrieve() — vector-valued task
    outputs (top-k ids/scores) ride the same dynamic batcher as rankers."""
    from concurrent.futures import ThreadPoolExecutor

    from recalgorithm_tpu.serving.server import BatchingPredictor

    model, variables = _init(TwoTowerConfig(hidden_units=(32,), output_dim=8))
    retr = Retriever(model, variables, serve_k=5)
    retr.build_corpus(
        {k: jnp.asarray(a) for k, a in _gen.batch(B, s).items()}
        for s in (1, 2)
    )
    direct_ids, direct_scores = retr.retrieve(BATCH, k=5)

    server = BatchingPredictor(retr, max_batch_size=16, max_delay_ms=5.0)
    try:
        examples = [
            {k: np.asarray(v)[i] for k, v in BATCH.items()} for i in range(B)
        ]
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(server.predict_one, examples))
    finally:
        server.close()
    np.testing.assert_array_equal(
        np.stack([r["feedids"] for r in results]), direct_ids
    )
    np.testing.assert_allclose(
        np.stack([r["scores"] for r in results]), direct_scores,
        rtol=1e-4, atol=1e-5,
    )


def test_task_loss_weight_scales_sigmoid_ce():
    """tlw=0 removes exactly the per-task sigmoid CE from the total loss
    (pure in-batch-softmax training) — trainer-level hook, model-agnostic."""
    def total_for(weight):
        cfg = TwoTowerConfig(
            hidden_units=(32,), output_dim=8,
            task_loss_weights=(("read_comment", weight),),
        )
        model = TwoTower(config=cfg, schema=SCHEMA)
        trainer = Trainer(
            model, cfg.task_names, optimizers.build("adam", 1e-3),
            TrainerConfig(train_steps=1),
        )
        state = trainer.init_state(BATCH)
        total, (_, _, per_task, _) = trainer._loss_and_logits(
            state.params, state.batch_stats, BATCH, False, None
        )
        return float(total), float(per_task["read_comment"])

    t1, ce1 = total_for(1.0)
    t0, ce0 = total_for(0.0)
    np.testing.assert_allclose(ce0, ce1, rtol=1e-6)  # same init, same CE
    np.testing.assert_allclose(t1 - t0, ce1, rtol=1e-5)


def test_two_tower_learns_and_recall_improves(tmp_path):
    """40 steps on synthetic data: the cosine-logit AUC beats chance AND
    offline Recall@K with the trained towers beats the untrained towers on
    the same corpus — the in-batch softmax actually pulls clicked (user,
    item) pairs together."""
    cfg = TwoTowerConfig(batch_size=128, hidden_units=(64,), output_dim=16)
    model = TwoTower(config=cfg, schema=SCHEMA)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp_path), train_steps=40, log_every=20,
                      save_checkpoints_steps=1000),
    )
    state, ev = trainer.train_and_evaluate(
        _gen.batches(128, 40),
        lambda: _gen.batches(128, 8, start_seed=9000),
    )
    assert ev["read_comment_auc"] > 0.55, ev
    assert np.isfinite(ev["loss"])

    def recall(variables):
        retr = Retriever(model, variables)
        corpus = [b for b in _gen.batches(128, 4, start_seed=9000)]
        retr.build_corpus(corpus)
        return retr.recall_at_k(
            _gen.batches(128, 4, start_seed=9000), k=20,
            label_index=SCHEMA.labels.index("read_comment"),
        )

    trained = recall({"params": state.params, "batch_stats": state.batch_stats})
    fresh = recall(_init(cfg)[1])
    assert trained > fresh, (trained, fresh)


def test_quantized_corpus_retrieval_recall():
    """int8-corpus retrieval (coarse int8 MXU scoring + exact rescore)
    recovers the exact-f32 top-k with high overlap and close scores, while
    storing the corpus 4x smaller and never keeping the f32 matrix."""
    model, variables = _init(TwoTowerConfig(hidden_units=(32,), output_dim=8))
    item_batches = [
        {k: jnp.asarray(a) for k, a in _gen.batch(B, s).items()}
        for s in (1, 2, 3, 4)
    ]
    exact = Retriever(model, variables)
    n = exact.build_corpus(item_batches)
    quant = Retriever(model, variables, quantize_corpus=True, overfetch=4)
    assert quant.build_corpus(item_batches) == n
    assert quant.corpus is None  # f32 corpus never materialised
    assert quant.corpus_q.dtype == jnp.int8
    f32_bytes = n * 8 * 4
    q_bytes = quant.corpus_q.size + quant.corpus_scale.size * 4
    assert q_bytes < 0.45 * f32_bytes

    k = 10
    ids_e, scores_e = exact.retrieve(BATCH, k=k)
    ids_q, scores_q = quant.retrieve(BATCH, k=k)
    overlap = np.mean([
        len(set(ids_e[b]) & set(ids_q[b])) / k for b in range(B)
    ])
    assert overlap >= 0.9, overlap
    # rescored top-1 score matches the exact one closely (rescore uses the
    # f32 user vector; residual error is corpus-side quantization only)
    np.testing.assert_allclose(scores_q[:, 0], scores_e[:, 0], atol=5e-3)
    assert np.all(np.diff(scores_q, axis=-1) <= 1e-6)

    # mesh + quantize is rejected (sharding already divides corpus HBM)
    from recalgorithm_tpu.parallel.mesh import make_mesh
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Retriever(model, variables, mesh=make_mesh(num_model=2),
                  quantize_corpus=True)


def test_corpus_snapshot_roundtrip(tmp_path):
    """save_corpus/load_corpus: a serving replica loads the published index
    without re-embedding and retrieves identically (f32 and int8)."""
    model, variables = _init(TwoTowerConfig(hidden_units=(32,), output_dim=8))
    item_batches = [
        {k: jnp.asarray(a) for k, a in _gen.batch(B, s).items()}
        for s in (1, 2)
    ]
    for quantize in (False, True):
        builder = Retriever(model, variables, quantize_corpus=quantize)
        n = builder.build_corpus(item_batches)
        # suffix-less path: np.savez appends .npz — save/load must agree
        path = str(tmp_path / f"corpus_{quantize}")
        written = builder.save_corpus(path)
        assert written.endswith(".npz")

        replica = Retriever(model, variables, quantize_corpus=quantize)
        assert replica.load_corpus(path) == n
        ids_a, scores_a = builder.retrieve(BATCH, k=5)
        ids_b, scores_b = replica.retrieve(BATCH, k=5)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_allclose(scores_a, scores_b, rtol=1e-6)

    # mismatched snapshot kind is a clean error
    import pytest as _pytest
    wrong = Retriever(model, variables, quantize_corpus=False)
    with _pytest.raises(ValueError, match="int8"):
        wrong.load_corpus(str(tmp_path / "corpus_True.npz"))

    # PAD/OOV id 0 never enters a corpus (padded eval tails, stale vocab)
    padded = [dict(b) for b in item_batches]
    feed0 = np.asarray(padded[0]["feedid"]).copy()
    feed0[:3] = 0
    padded[0]["feedid"] = jnp.asarray(feed0)
    r0 = Retriever(model, variables)
    r0.build_corpus(padded)
    assert 0 not in set(np.asarray(r0.corpus_ids).tolist())
