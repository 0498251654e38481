"""Diagnose WHERE the in-model compact-scatter regression comes from.

Round-3 finding: compact_grad_scatter regresses DIN 5.1->8.1 ms in-model
(+~3 ms per compact lookup) even though the isolated scatter math predicts
~0.6 vs 1.9 ms.  Same composition failure shape as the round-2 Pallas MXU
scatter.  This probe runs the DIN step with surgically-varied backward
implementations to separate:

  plain        no custom_vjp at all (baseline)
  vjp_full     custom_vjp whose backward is the IDENTICAL full scatter
               -> isolates the pure custom-vjp boundary cost
  nocond       compaction with a FIXED cap, no cond ladder
               -> isolates lax.cond cost (exact only for sparse batches)
  onecond      fixed cap + single full-scatter fallback cond
  ladder       the production cond ladder (caps 2,3,4,6,8)

Run: python benchmarks/compact_probe2.py [variants...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4096


def make_take(kind):
    import jax
    import jax.numpy as jnp

    from recalgorithm_tpu.ops import compact_scatter as cs

    if kind == "plain":
        return None

    @jax.custom_vjp
    def take(table, ids):
        return jnp.take(table, ids, axis=0, mode="clip")

    def fwd(table, ids):
        return take(table, ids), (table.shape, ids)

    def bwd(res, g):
        (num_rows, k), ids = res
        if kind == "vjp_full":
            return cs._full_scatter(ids, g, num_rows), None
        if kind == "nocond":
            return cs._compact_scatter(ids, g, num_rows, ids.size // 4), None
        if kind == "onecond":
            return cs.scatter_grad(ids, g, num_rows), None
        raise ValueError(kind)

    take.defvjp(fwd, bwd)
    return take


def step_us(kind) -> float:
    import jax

    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.embed import tables as tables_mod
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DIN, DINConfig
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_us

    take = make_take(kind)
    if take is not None:
        from recalgorithm_tpu.ops import compact_scatter as cs

        orig = cs.take_compact_bwd
        cs.take_compact_bwd = take

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=BATCH, use_fused_attention=True)
    model = DIN(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 1e-3),
        TrainerConfig(model_dir="/tmp/compact_probe2", train_steps=30,
                      save_checkpoints_steps=0,
                      scoped_vmem_limit_kib=cfg.scoped_vmem_limit_kib,
                      compact_grad_scatter=(take is not None)),
    )
    batch = gen.batch(BATCH, 0)
    state = trainer.init_state(batch)
    try:
        return loop_step_time_us(
            trainer.train_step_fn, state, trainer._put_batch(batch),
            k_small=8, k_big=40,
            compiler_options=trainer.compiler_options,
        )
    finally:
        if take is not None:
            cs.take_compact_bwd = orig


def main():
    # ("ladder" — the in-graph cond ladder — was removed in favour of host
    # dispatch; its measurements live in docs/ROADMAP.md)
    kinds = sys.argv[1:] or ["plain", "vjp_full", "nocond", "onecond"]
    results = {}
    for kind in kinds:
        t0 = time.time()
        us = step_us(kind)
        results[kind] = round(us, 1)
        print(f"DIN_{kind}: {us:.1f} us/step ({BATCH / us * 1e6:,.0f} ex/s) "
              f"[{time.time()-t0:.0f}s]", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
