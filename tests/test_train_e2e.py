"""End-to-end trainer tests: learn on synthetic data, checkpoint/resume,
best-export + Predictor round trip, streaming AUC sanity, summaries."""

import json
import os

import jax
import numpy as np
import pytest

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.deep_crossing import DeepCrossing, DeepCrossingConfig
from recalgorithm_tpu.serving.predictor import Predictor
from recalgorithm_tpu.train import metrics as M
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig, _Checkpointer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepCrossingConfig(batch_size=128, train_steps=60)
    model = DeepCrossing(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp), train_steps=60, log_every=20,
                      save_checkpoints_steps=30),
    )
    state, ev = trainer.train_and_evaluate(
        gen.batches(128, 60),
        lambda: gen.batches(128, 8, start_seed=5000),
    )
    return tmp, gen, schema, cfg, model, trainer, state, ev


def test_model_learns(setup):
    _, _, _, _, _, _, _, ev = setup
    assert ev["read_comment_auc"] > 0.6
    assert ev["loss"] < 0.6


def test_checkpoint_resume(setup):
    tmp, gen, _, cfg, model, trainer, state, _ = setup
    trainer2 = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp), train_steps=60),
    )
    st = trainer2.init_state(gen.batch(128, 0))
    ck = _Checkpointer(str(tmp), 5)
    st = ck.restore_latest(st)
    ck.close()
    assert int(st.step) == 60
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(st.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
        rtol=1e-6,
    )


def test_best_export_and_predictor(setup):
    tmp, gen, _, cfg, model, trainer, state, ev = setup
    export_dir = Predictor.latest_best(str(tmp))
    assert os.path.isdir(export_dir)
    pred = Predictor(model, export_dir)
    probs = pred.predict(gen.batches(128, 4, start_seed=5000))
    assert probs["read_comment"].shape == (512,)
    assert np.all((probs["read_comment"] >= 0) & (probs["read_comment"] <= 1))
    # predictor output matches trainer.predict on the same state
    direct = trainer.predict(state, gen.batches(128, 4, start_seed=5000))
    np.testing.assert_allclose(
        probs["read_comment"], direct["read_comment"], rtol=1e-4, atol=1e-5
    )


def test_summaries_written(setup):
    tmp, *_ = setup
    path = tmp / "summaries" / "scalars.jsonl"
    lines = [json.loads(x) for x in open(path)]
    assert any("train/loss" in r for r in lines)
    assert any("eval/read_comment_auc" in r for r in lines)


def test_streaming_auc_matches_exact():
    rng = np.random.default_rng(0)
    labels = (rng.random(4000) < 0.3).astype(np.float32)
    scores = np.clip(labels * 0.3 + rng.random(4000) * 0.7, 0, 1).astype(np.float32)
    st = M.AUCState.init()
    for i in range(0, 4000, 500):
        st = M.auc_update(
            st,
            jax.numpy.asarray(labels[i : i + 500]),
            jax.numpy.asarray(scores[i : i + 500]),
        )
    binned = float(M.auc_compute(st))
    exact = M.exact_auc(labels, scores)
    assert abs(binned - exact) < 0.005, (binned, exact)


def test_bf16_model_learns(tmp_path):
    """Mixed-precision training (bf16 tower matmuls, f32 params/optimizer)
    learns just like f32 — the gradient path through the downcast matmuls is
    well-conditioned."""
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepCrossingConfig(batch_size=128, train_steps=60, precision="bf16")
    model = DeepCrossing(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp_path), train_steps=60, log_every=50,
                      save_checkpoints_steps=0),
    )
    _, ev = trainer.train_and_evaluate(
        gen.batches(128, 60),
        lambda: gen.batches(128, 8, start_seed=5000),
    )
    assert ev["read_comment_auc"] > 0.6
    assert ev["loss"] < 0.6


def test_fused_bst_flags_train(tmp_path):
    """The fused-attention BST variants (kernel-layout boundary + bf16 saved
    probabilities) train through the public config surface alone —
    attn_interpret runs the Pallas kernels interpreted on CPU."""
    from recalgorithm_tpu.models.bst import BST, BSTConfig

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = BSTConfig(batch_size=128, use_fused_attention=True,
                    save_attn_bf16=True, kernel_layout_attn=True,
                    attn_interpret=True)
    model = BST(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 1e-3),
        TrainerConfig(model_dir=str(tmp_path), train_steps=6, log_every=6,
                      save_checkpoints_steps=0),
    )
    state = trainer.init_state(gen.batch(128, 0))
    trainer._compile()
    losses = []
    for i in range(6):
        b = trainer._put_batch(gen.batch(128, i))
        state, loss = trainer._train_jit(state, b, jax.random.key(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses


def test_eval_throttle_secs(tmp_path):
    """throttle_secs parity: time-based evals fire during training and the
    best-exporter keeps artifacts."""
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepCrossingConfig(batch_size=64, train_steps=30)
    model = DeepCrossing(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp_path), train_steps=30, log_every=100,
                      save_checkpoints_steps=0, eval_throttle_secs=1e-6),
    )
    evals = []
    trainer.train_and_evaluate(
        gen.batches(64, 30),
        lambda: gen.batches(64, 2, start_seed=5000),
        log_fn=lambda msg: evals.append(msg) if msg.startswith("eval @") else None,
    )
    assert len(evals) >= 5, evals  # throttle ~0 -> eval after ~every step
    assert os.path.isdir(os.path.join(str(tmp_path), "export"))


def test_grad_accum_matches_big_batch(tmp_path):
    """grad_accum_steps=2 at b=64 equals one b=128 step on the
    concatenated batch (SGD, BN/dropout off: the mean-of-micro-grads IS
    the big-batch gradient)."""
    from recalgorithm_tpu.models.dcn import DCN, DCNConfig

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    big = gen.batch(128, 0)
    micro = [{k: v[:64] for k, v in big.items()},
             {k: v[64:] for k, v in big.items()}]

    def run(batches, accum, name):
        cfg = DCNConfig(batch_size=64, batch_norm=False, dropout_rate=0.0)
        model = DCN(config=cfg, schema=schema)
        trainer = Trainer(
            model, cfg.task_names, optimizers.build("sgd", 0.01),
            TrainerConfig(model_dir=str(tmp_path / name), train_steps=9,
                          save_checkpoints_steps=0, grad_accum_steps=accum),
        )
        state = trainer.init_state(micro[0])
        trainer._compile()
        for b in batches:
            state, _ = trainer._train_jit(
                state, trainer._put_batch(b), jax.random.key(0, impl="rbg"))
        return state.params

    p_accum = run(micro, 2, "accum")
    p_big = run([big], 1, "big")
    for a, b in zip(jax.tree.leaves(p_accum), jax.tree.leaves(p_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_sigterm_saves_checkpoint_and_stops(tmp_path):
    """Preemption safety: SIGTERM mid-training finishes the in-flight
    step, saves a checkpoint, skips the final eval, and a restarted run
    resumes from the saved step."""
    import signal

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepCrossingConfig(batch_size=64)

    def make_trainer():
        model = DeepCrossing(config=cfg, schema=schema)
        return Trainer(
            model, cfg.task_names, optimizers.build("adam", 0.005),
            TrainerConfig(model_dir=str(tmp_path), train_steps=50,
                          log_every=1000, save_checkpoints_steps=0),
        )

    def batches_then_sigterm(n_before):
        for i in range(50):
            if i == n_before:
                # delivered to this (main) thread between steps, exactly
                # like a preemption notice landing mid-run
                os.kill(os.getpid(), signal.SIGTERM)
            yield gen.batch(64, i)

    logs = []
    trainer = make_trainer()
    state, ev = trainer.train_and_evaluate(
        batches_then_sigterm(5),
        lambda: gen.batches(64, 2, start_seed=5000),
        log_fn=logs.append,
    )
    stopped_at = int(state.step)
    assert stopped_at < 20, stopped_at  # stopped long before train_steps=50
    assert ev == {}  # final eval skipped
    assert any("SIGTERM" in m for m in logs), logs
    # the default handler is restored (not our lambda)
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL
    # restart resumes from the saved checkpoint and completes normally
    trainer2 = make_trainer()
    state2, ev2 = trainer2.train_and_evaluate(
        gen.batches(64, 50, start_seed=100),
        lambda: gen.batches(64, 2, start_seed=5000),
    )
    assert int(state2.step) == 50
    assert "read_comment_auc" in ev2


def test_eval_throttle_multiprocess_agreement(tmp_path, monkeypatch):
    """Multi-process time-based evals must fire on the SAME step on every
    host: the decision runs only at the log_every cadence and goes through
    the agreed_flag broadcast (process 0's clock decides) — a host-local
    clock check could diverge the per-step programs inside collectives."""
    from recalgorithm_tpu.parallel import multihost

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepCrossingConfig(batch_size=64)
    model = DeepCrossing(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp_path), train_steps=10, log_every=5,
                      save_checkpoints_steps=0, eval_throttle_secs=1e-6),
    )
    calls = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost, "agreed_flag",
                        lambda flag: calls.append(flag) or flag)
    # off-cadence step: no decision, and crucially no collective
    assert trainer._time_eval_due(7, last_eval_time=0.0) is False
    assert calls == []
    # on-cadence step: process-0's (elapsed) verdict via the broadcast
    assert trainer._time_eval_due(10, last_eval_time=0.0) is True
    assert calls == [True]
    # single-process keeps the plain local check on every step
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert trainer._time_eval_due(7, last_eval_time=0.0) is True
    assert calls == [True]


def test_model_summaries_collection(tmp_path):
    """Gate-weight / kernel summaries flow: sow -> TrainState -> JSONL.

    LoggingTensorHook parity (reference mmoe.py:294-309 gate weights,
    wide_and_deep.py:288-291 wide-kernel histogram + L2 norm).
    """
    from recalgorithm_tpu.models.mmoe import MMOE, MMOEConfig

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = MMOEConfig(batch_size=64, train_steps=12, num_experts=3,
                     expert_hidden_units=32, hidden_units=(16,))
    model = MMOE(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp_path), train_steps=12, log_every=10,
                      save_checkpoints_steps=0),
    )
    state, _ = trainer.train_and_evaluate(gen.batches(64, 12), None)
    # per-task gates sown every step; 3 experts -> (3,) batch means
    flat = jax.tree_util.tree_flatten_with_path(state.summaries)[0]
    tags = ["/".join(str(getattr(k, "key", "")) for k in p) for p, _ in flat]
    for task in cfg.task_names:
        assert any(f"gate_{task}" in t for t in tags), tags
    for _, leaf in flat:
        v = np.asarray(leaf)
        assert v.shape == (3,)
        np.testing.assert_allclose(v.sum(), 1.0, rtol=1e-5)
    # and they land in the scalar JSONL at log steps
    lines = [json.loads(x) for x in open(tmp_path / "summaries" / "scalars.jsonl")]
    assert any(
        any(k.startswith("summaries/gate_") for k in r) for r in lines
    )


def test_legacy_ple_checkpoint_restores(tmp_path):
    """A round-1-layout PLE checkpoint ('shared'/'shared_final' scopes)
    restores through the rename shim in _Checkpointer.restore_latest."""
    from recalgorithm_tpu.models.ple import PLE, PLEConfig
    from recalgorithm_tpu.train.loop import (
        _LEGACY_PARAM_RENAMES, _rename_dict_keys,
    )

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = PLEConfig(batch_size=64, train_steps=4)
    model = PLE(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp_path), train_steps=4,
                      save_checkpoints_steps=0),
    )
    state = trainer.init_state(gen.batch(64, 0))
    assert any("experts_shared" in k for k in state.params)  # rename applies

    # write a checkpoint in the ROUND-1 layout (new -> legacy key names)
    legacy_state = state.replace(
        params=_rename_dict_keys(state.params, _LEGACY_PARAM_RENAMES),
        opt_state=_rename_dict_keys(state.opt_state, _LEGACY_PARAM_RENAMES),
        step=state.step + 3,
    )
    ck = _Checkpointer(str(tmp_path), 5)
    ck.save(legacy_state)
    ck.mgr.wait_until_finished()

    restored = ck.restore_latest(trainer.init_state(gen.batch(64, 0)))
    ck.close()
    assert int(restored.step) == 3
    assert set(restored.params) == set(state.params)
    # and the restored state trains a step under the current layout
    trainer._compile()
    batch = trainer._put_batch(gen.batch(64, 1))
    out, loss = trainer._train_jit(restored, batch, jax.random.key(0, impl="rbg"))
    assert np.isfinite(float(loss))


def test_eval_reports_logloss_and_calibration(setup):
    """Per-task production diagnostics: logloss equals the weighted sigmoid
    CE of the served probabilities; calibration = mean(pred)/mean(label)."""
    _, gen, _, _, model, trainer, state, ev = setup
    assert "read_comment_logloss" in ev and "read_comment_calibration" in ev
    # recompute both on host from the model's own probabilities
    ps, ys = [], []
    for hb in gen.batches(128, 8, start_seed=5000):
        batch = trainer._put_batch(hb)
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, mutable=["losses"],
        )
        ps.append(np.asarray(jax.nn.sigmoid(logits["read_comment"])))
        ys.append(np.asarray(hb["labels"][:, 0]))
    p = np.concatenate(ps).astype(np.float64)
    y = np.concatenate(ys).astype(np.float64)
    eps = 1e-7
    pc = np.clip(p, eps, 1 - eps)
    want_ll = float(np.mean(-(y * np.log(pc) + (1 - y) * np.log1p(-pc))))
    np.testing.assert_allclose(ev["read_comment_logloss"], want_ll, rtol=2e-3)
    np.testing.assert_allclose(
        ev["read_comment_calibration"], p.mean() / y.mean(), rtol=2e-3
    )
    assert 0.2 < ev["read_comment_calibration"] < 5.0


def test_grouped_auc_oracle():
    """GAUC equals the impression-weighted mean of per-user exact AUCs;
    single-class users are excluded from numerator and weight mass."""
    from recalgorithm_tpu.train.metrics import exact_auc, grouped_auc

    groups = np.array([1, 1, 1, 2, 2, 3, 3, 3, 3])
    labels = np.array([1, 0, 0, 1, 1, 0, 1, 0, 1], np.float64)  # user 2: all-pos
    scores = np.array([.9, .2, .4, .8, .7, .1, .6, .5, .3], np.float64)
    want = (3 * exact_auc(labels[:3], scores[:3])
            + 4 * exact_auc(labels[5:], scores[5:])) / 7
    np.testing.assert_allclose(grouped_auc(labels, scores, groups), want)
    # unsorted group order gives the same result
    perm = np.random.default_rng(0).permutation(len(groups))
    np.testing.assert_allclose(
        grouped_auc(labels[perm], scores[perm], groups[perm]), want)
    # all single-class -> nan
    assert np.isnan(grouped_auc(np.ones(4), scores[:4], np.array([1, 1, 2, 2])))
    # one user == global AUC
    np.testing.assert_allclose(
        grouped_auc(labels, scores, np.zeros(9)), exact_auc(labels, scores))


def test_sigkill_crash_then_resume(tmp_path):
    """Hard-crash consistency: SIGKILL mid-training (no cleanup at all)
    leaves the checkpoint directory loadable — Orbax saves are atomic — and
    a restart resumes from the last completed checkpoint, not step 0."""
    import signal
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent("""
        import os, sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
        from recalgorithm_tpu.features.schema import wechat_schema
        from recalgorithm_tpu.models.deep_crossing import DeepCrossing, DeepCrossingConfig
        from recalgorithm_tpu.train import optimizers
        from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

        tmp, crash_after = sys.argv[1], int(sys.argv[2])
        gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
        schema = wechat_schema(gen.vocab_sizes())
        cfg = DeepCrossingConfig(batch_size=64)
        trainer = Trainer(
            DeepCrossing(config=cfg, schema=schema), cfg.task_names,
            optimizers.build("adam", 0.005),
            TrainerConfig(model_dir=tmp, train_steps=40, log_every=1000,
                          save_checkpoints_steps=10),
        )

        def batches():
            for i in range(40):
                if crash_after >= 0 and i == crash_after:
                    # checkpoint-at-10 has landed; die with no cleanup
                    os.kill(os.getpid(), 9)
                yield gen.batch(64, i)

        state, ev = trainer.train_and_evaluate(
            batches(), lambda: gen.batches(64, 2, start_seed=5000))
        print("DONE_STEP", int(state.step), "AUC" in str(sorted(ev)) or ev != {})
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    crashed = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path), "17"],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert crashed.returncode == -signal.SIGKILL, (
        crashed.returncode, crashed.stderr[-500:])
    # the checkpoint dir holds the step-10 save and restores cleanly
    resumed = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path), "-1"],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert "DONE_STEP 40" in resumed.stdout, resumed.stdout[-300:]
