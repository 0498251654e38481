"""BST step variants: quantify the save-attn HBM trade and kernel layout.

Round-3 probe for the zoo-floor model.  Variants:

  f32      production fused attention (f32 saved probabilities)
  bf16     save_attn_bf16=True — halves the saved-probability round trip
           (~280 MB/step at batch 4096, H=3, T=51)
  klayout  kernel_layout_attn=True — projections emit the kernel's
           (H, T*d, B) layout directly; no explicit transposes around
           the Pallas boundary (6 x ~40 MB of copies in fwd+bwd)
  kl_bf16  both

Run on the chip: python benchmarks/bst_probe.py [variants...]
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
    from recalgorithm_tpu.models.bst import BST, BSTConfig
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_us

    cfg = BSTConfig(
        batch_size=BATCH,
        use_fused_attention=True,
        save_attn_bf16=variant in ("bf16", "kl_bf16"),
        kernel_layout_attn=variant in ("klayout", "kl_bf16"),
    )
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
    schema = wechat_schema(gen.vocab_sizes())
    model = BST(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 1e-3),
        TrainerConfig(model_dir="/tmp/bst_probe", train_steps=30,
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


def main():
    variants = sys.argv[1:] or ["f32", "bf16", "klayout", "kl_bf16"]
    results = {}
    for v in variants:
        t0 = time.time()
        us = step_us(v)
        results[v] = round(us, 1)
        print(f"BST_{v}: {us:.1f} us/step ({BATCH / us * 1e6:,.0f} ex/s) "
              f"[{time.time()-t0:.0f}s]", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
