"""Benchmark: flagship-model training throughput on the available chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}

Measures steady-state train-step throughput (forward + backward + optimizer +
metric update, donated state, device-resident batches) of DIN on WeChat-shaped
synthetic data with real-dataset vocabulary sizes at batch 4096.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6,
TF 1.14 single-process CPU).  BASELINE.json's target is >=10x the TF1 CPU
baseline; we take 2,000 examples/s as a generous estimate of TF1-CPU
throughput for these models at batch 1024 (typical measured range is
0.5k-3k ex/s), so vs_baseline = value / 2000 and the >=10x bar means
vs_baseline >= 10.
"""

from __future__ import annotations

import json
import time

TF1_CPU_BASELINE_EXAMPLES_PER_S = 2_000.0


def run_bench(batch_size: int = 4096, steps: int = 30, warmup: int = 5) -> dict:
    import jax

    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DIN, DINConfig
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

    n_chips = len(jax.devices())
    on_tpu = jax.devices()[0].platform != "cpu"
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))  # real vocab sizes
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=batch_size, use_fused_attention=on_tpu)
    model = DIN(config=cfg, schema=schema)
    trainer = Trainer(
        model,
        cfg.task_names,
        optimizers.build("adam", 1e-3),
        TrainerConfig(model_dir="/tmp/recalgorithm_bench", train_steps=steps,
                      save_checkpoints_steps=0),
        mesh=None,
    )
    state = trainer.init_state(gen.batch(batch_size, 0))
    trainer._compile()

    # a few device-resident batches, cycled (isolates device step time; the
    # host pipeline is benchmarked separately in the data layer)
    device_batches = [trainer._put_batch(gen.batch(batch_size, i)) for i in range(4)]
    rng = jax.random.key(0)

    for i in range(warmup):
        rng, sub = jax.random.split(rng)
        state, loss = trainer._train_jit(state, device_batches[i % 4], sub)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss = trainer._train_jit(state, device_batches[i % 4], sub)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    examples_per_s = steps * batch_size / dt
    per_chip = examples_per_s / n_chips
    return {
        "metric": "DIN_train_examples_per_s_per_chip_b4096",
        "value": round(per_chip, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(per_chip / TF1_CPU_BASELINE_EXAMPLES_PER_S, 2),
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
