"""In-model decision probe for the PAD-compacted gradient scatter.

Measures full train-step time (slope method) for sequence-heavy models
with TrainerConfig.compact_grad_scatter off vs on, in ONE process.
The round-2 lesson (docs/ROADMAP.md): isolated scatter wins do not
automatically survive composition into a real step — the custom-vjp
boundary can break XLA's fusion plan.  This probe is the honest test.

Run: python benchmarks/compact_probe.py [DIN WideAndDeep BST ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4096


def step_us(model_name: str, compact: bool) -> float:
    import jax

    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models import MODEL_REGISTRY
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_us

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY[model_name]
    kw = {}
    if "use_fused_attention" in cfg_cls.__dataclass_fields__:
        kw["use_fused_attention"] = True
    cfg = cfg_cls(batch_size=BATCH, **kw)
    model = model_cls(config=cfg, schema=schema)
    if hasattr(model_cls, "wide_param_predicate"):
        opt = optimizers.dual_wide_deep(
            cfg.wide_part_learning_rate, cfg.deep_part_optimizer,
            cfg.deep_part_learning_rate, model_cls.wide_param_predicate)
    else:
        opt = optimizers.build(getattr(cfg, "optimizer", "adam"), 1e-3)
    trainer = Trainer(
        model, cfg.task_names, opt,
        TrainerConfig(model_dir="/tmp/compact_probe", train_steps=30,
                      save_checkpoints_steps=0,
                      scoped_vmem_limit_kib=getattr(
                          cfg, "scoped_vmem_limit_kib", 65536),
                      compact_grad_scatter=compact),
    )
    batch = gen.batch(BATCH, 0)
    state = trainer.init_state(batch)
    return loop_step_time_us(
        trainer.train_step_fn, state, trainer._put_batch(batch),
        k_small=8, k_big=40,
        compiler_options=trainer.compiler_options,
    )


def main():
    models = sys.argv[1:] or ["DIN", "WideAndDeep", "BST"]
    results = {}
    for name in models:
        for compact in (False, True):
            t0 = time.time()
            us = step_us(name, compact)
            tag = f"{name}_{'compact' if compact else 'plain'}"
            results[tag] = round(us, 1)
            print(f"{tag}: {us:.1f} us/step "
                  f"({BATCH / us * 1e6:,.0f} ex/s) [{time.time()-t0:.0f}s]",
                  file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
