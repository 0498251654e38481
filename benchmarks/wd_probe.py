"""W&D wide-cross scatter: can short-T compaction win at a bigger cap?

Round-3 question: the cross (T=24, ~25% live) REGRESSED under divisor-4
compaction (652k -> 612k ex/s) — but sum(lens) sits right at the B*T/4
cap, so the host dispatcher kept routing whole batches to the plain step.
A divisor-2 cap never overflows at this density and still halves the
scatter entries.  Variants:

  prod   production gates (cross NOT compacted; feedid seq is)
  div2   cross compacted with cap B*T/2   (LONG_SEQ_T lowered to 16)
  div4   cross compacted with cap B*T/4   (the measured regression, rerun)

Run on the chip: python benchmarks/wd_probe.py [variants...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4096


def step_us(variant: str) -> float:
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.wide_and_deep import WideAndDeep, WideAndDeepConfig
    from recalgorithm_tpu.ops import compact_scatter as cs
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_us

    saved = (cs.LONG_SEQ_T, cs._divisor_for)
    if variant in ("div2", "div4"):
        div = 2 if variant == "div2" else 4
        cs.LONG_SEQ_T = 16
        cs._divisor_for = lambda t: div if t < 32 else cs.CAP_DIVISOR
    try:
        gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
        schema = wechat_schema(gen.vocab_sizes())
        cfg = WideAndDeepConfig(batch_size=BATCH)
        model = WideAndDeep(config=cfg, schema=schema)
        trainer = Trainer(
            model, cfg.task_names,
            optimizers.dual_wide_deep(
                cfg.wide_part_learning_rate,
                cfg.deep_part_optimizer,
                cfg.deep_part_learning_rate,
                model.wide_param_predicate,
            ),
            TrainerConfig(model_dir="/tmp/wd_probe", train_steps=30,
                          save_checkpoints_steps=0,
                          scoped_vmem_limit_kib=cfg.scoped_vmem_limit_kib),
        )
        batch = gen.batch(BATCH, 0)
        state = trainer.init_state(batch)
        return loop_step_time_us(
            trainer.train_step_fn, state, trainer._put_batch(batch),
            k_small=8, k_big=40,
            compiler_options=trainer.compiler_options,
        )
    finally:
        cs.LONG_SEQ_T, cs._divisor_for = saved


def main():
    variants = sys.argv[1:] or ["prod", "div2", "div4"]
    results = {}
    for v in variants:
        t0 = time.time()
        us = step_us(v)
        results[v] = round(us, 1)
        print(f"WD_{v}: {us:.1f} us/step ({BATCH / us * 1e6:,.0f} ex/s) "
              f"[{time.time()-t0:.0f}s]", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
