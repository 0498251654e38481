"""Benchmark: flagship-model training throughput on the available chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}

Measures steady-state train-step time (forward + backward + optimizer +
metric update, device-resident batch) of DIN on WeChat-shaped synthetic data
with real-dataset vocabulary sizes at batch 4096, using the K-step-loop slope
method (utils/benchmarking.py) — per-call wall timing is unreliable on
tunneled TPU backends (block_until_ready can return before device work
finishes), so the step runs inside jit(fori_loop) for two loop lengths and
the slope is the honest per-step time.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6,
TF 1.14 single-process CPU).  The denominator is a MEASURED number:
benchmarks/baseline_cpu.py trains a faithful torch-CPU DIN (same tables,
attention and tower, reference batch 1024) on this host and records
benchmarks/BASELINE_CPU.json — 6,306 ex/s on the 1-core image (TF itself is
not installed, torch eager CPU is the closest stand-in for TF1 graph CPU).
BASELINE.json's target of >=10x the CPU baseline means vs_baseline >= 10.
Falls back to a conservative 2,000 ex/s estimate if the measurement file is
missing.
"""

from __future__ import annotations

import json
import os


def _cpu_baseline_examples_per_s() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "BASELINE_CPU.json")
    try:
        with open(path) as f:
            return float(json.load(f)["examples_per_s"])
    except Exception:
        return 2_000.0


TF1_CPU_BASELINE_EXAMPLES_PER_S = _cpu_baseline_examples_per_s()


def _throughput(batch_size: int, time_budget_s: float | None = None) -> dict:
    """DIN steady-state train throughput stats (examples/s/chip) at batch_size.

    Variance protocol (round 5): median ± σ over up to 5 INDEPENDENT
    fresh-compile slope measurements (utils/benchmarking.loop_step_time_stats)
    — one slope number cannot distinguish a real regression from run-to-run
    spread (round-4 artifacts disagreed by ~3% with no error bars).
    """
    import jax

    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DIN, DINConfig
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_stats

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
        TrainerConfig(model_dir="/tmp/recalgorithm_bench", train_steps=30,
                      save_checkpoints_steps=0,
                      scoped_vmem_limit_kib=cfg.scoped_vmem_limit_kib),
        mesh=None,
    )
    batch = gen.batch(batch_size, 0)
    state = trainer.init_state(batch)
    device_batch = trainer._put_batch(batch)
    k_big = 72 if on_tpu else 24  # CPU fallback keeps the bench under a minute
    stats = loop_step_time_stats(
        trainer.train_step_fn, state, device_batch,
        reps=5 if on_tpu else 2, time_budget_s=time_budget_s,
        k_small=8, k_big=k_big, compiler_options=trainer.compiler_options,
    )
    to_eps = lambda us: batch_size / us * 1e6 / n_chips
    return {
        "examples_per_s": to_eps(stats["median_us"]),
        # σ propagated through the reciprocal at first order
        "sigma": to_eps(stats["median_us"])
                 * stats["sigma_us"] / stats["median_us"],
        "reps_examples_per_s": [round(to_eps(u), 1) for u in stats["reps_us"]],
    }


def run_bench(batch_size: int = 4096) -> dict:
    # budgets keep the full run well inside the 1200s watchdog even if a
    # rep straggles (budget is checked between reps, >=2 reps always run)
    s = _throughput(batch_size, time_budget_s=450.0)
    per_chip = s["examples_per_s"]
    # like-for-like vs the measured CPU baseline: the baseline trains at the
    # reference batch 1024, so report a b1024 TPU number alongside —
    # vs_baseline_b1024 is the apples-to-apples multiple, the headline b4096
    # value is the throughput number (see benchmarks/BATCH_SCALING.md)
    s1024 = s if batch_size == 1024 else _throughput(1024, time_budget_s=180.0)
    return {
        "metric": f"DIN_train_examples_per_s_per_chip_b{batch_size}",
        "value": round(per_chip, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(per_chip / TF1_CPU_BASELINE_EXAMPLES_PER_S, 2),
        "sigma": round(s["sigma"], 1),
        "reps": s["reps_examples_per_s"],
        "value_b1024": round(s1024["examples_per_s"], 1),
        "sigma_b1024": round(s1024["sigma"], 1),
        "vs_baseline_b1024": round(
            s1024["examples_per_s"] / TF1_CPU_BASELINE_EXAMPLES_PER_S, 2
        ),
    }


if __name__ == "__main__":
    import threading

    # The tunneled TPU backend has been observed to HANG jax initialisation
    # indefinitely when the tunnel is down (not fail).  A hung bench leaves
    # no artifact at all; emit an honest failure line instead and exit
    # non-zero.  20 min is ~4x the slowest healthy full run observed.
    def _watchdog():
        print(json.dumps({
            "metric": "DIN_train_examples_per_s_per_chip_b4096",
            "value": 0.0, "unit": "examples/s/chip", "vs_baseline": 0.0,
            "error": "backend init / bench timed out after 1200s "
                     "(TPU tunnel unreachable?)",
        }), flush=True)
        os._exit(1)

    timer = threading.Timer(1200.0, _watchdog)
    timer.daemon = True
    timer.start()
    result = run_bench()
    timer.cancel()
    print(json.dumps(result))
