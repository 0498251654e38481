"""Op-level profile of a model's train step via jax.profiler + ProfileData.

Traces a few steady-state train steps on the real chip, parses the xplane
trace with jax.profiler.ProfileData, and prints the top ops by total device
time — the ground truth for where a step's milliseconds go.

Run: python benchmarks/profile_probe.py [--model BST] [--batch_size 4096]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _op_kind(instruction: str) -> str:
    """Canonical kind of an HLO device event: '%slice-start.4 = ...' ->
    'slice-start'; fusions keep the called-computation tag when present."""
    import re

    head = instruction.split(" = ", 1)[0].lstrip("%")
    kind = re.sub(r"\.\d+$", "", head)
    return kind


def top_ops(trainer, state, batch, steps: int = 6, top: int = 4) -> list[dict]:
    """Trace ``steps`` steady-state train steps and return the top device op
    KINDS (instruction names aggregated over `.N` copies).

    Returns ``[{"name", "us_per_step", "share_pct"}, ...]`` ranked by total
    device time — the roofline-audit hook used by run_all.py to publish a
    per-model top-op column (how AutoInt's lane-padding pathology was caught).
    Returns [] when no device plane is found (CPU backend writes none).
    """
    import jax

    for i in range(2):
        state, loss = trainer._train_jit(state, batch, jax.random.key(i))
    float(loss)
    tmp = tempfile.mkdtemp(prefix="xprof_top_")
    with jax.profiler.trace(tmp):
        for i in range(steps):
            state, loss = trainer._train_jit(
                state, batch, jax.random.key(100 + i))
        float(loss)
    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not files:
        return []
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())
    best: list[dict] = []
    best_total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            total_by_kind: dict[str, float] = collections.defaultdict(float)
            for ev in line.events:
                total_by_kind[_op_kind(ev.name)] += ev.duration_ns
            if not total_by_kind:
                continue
            total_ns = sum(total_by_kind.values())
            ranked = sorted(total_by_kind.items(), key=lambda kv: -kv[1])
            ops = [{"name": name,
                    "us_per_step": round(ns / 1e3 / steps, 1),
                    "share_pct": round(100 * ns / total_ns, 1)}
                   for name, ns in ranked[:top]]
            # keep the busiest line (the op stream, not host callbacks)
            if total_ns > best_total:
                best, best_total = ops, total_ns
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="BST")
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--fused", type=int, default=1)
    p.add_argument("--set", action="append", default=[],
                   help="config override key=value (int/float/bool literals)")
    args = p.parse_args()

    import jax

    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models import MODEL_REGISTRY
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

    B = args.batch_size
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY[args.model]
    kwargs = {"batch_size": B}
    if args.model in ("DIN", "BST") and jax.devices()[0].platform != "cpu":
        kwargs["use_fused_attention"] = bool(args.fused)
    import ast

    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            kwargs[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            kwargs[k] = v
    cfg = cfg_cls(**kwargs)
    model = model_cls(config=cfg, schema=schema)
    opt = optimizers.build(getattr(cfg, "optimizer", "adam"), 1e-3)
    tasks = tuple(cfg.task_names) or (schema.labels[0],)
    trainer = Trainer(
        model, tasks, opt,
        TrainerConfig(model_dir="/tmp/profile_probe", train_steps=1,
                      save_checkpoints_steps=0),
    )
    state = trainer.init_state(gen.batch(B, 0))
    batch = trainer._put_batch(gen.batch(B, 0))
    trainer._compile()
    # warm up / compile outside the trace
    for i in range(3):
        state, loss = trainer._train_jit(state, batch, jax.random.key(i))
    float(loss)

    tmp = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmp):
        for i in range(args.steps):
            state, loss = trainer._train_jit(state, batch, jax.random.key(100 + i))
        float(loss)  # barrier inside the trace

    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not files:
        print("no xplane trace written under", tmp)
        return
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read()
    )
    for plane in data.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            total_by_name: dict[str, float] = collections.defaultdict(float)
            count_by_name: dict[str, int] = collections.defaultdict(int)
            n_events = 0
            for ev in line.events:
                n_events += 1
                total_by_name[ev.name] += ev.duration_ns
                count_by_name[ev.name] += 1
            if n_events == 0:
                continue
            print(f"\n=== {plane.name} / line: {line.name} ({n_events} events) ===")
            ranked = sorted(total_by_name.items(), key=lambda kv: -kv[1])
            total_ns = sum(total_by_name.values())
            for name, ns in ranked[: args.top]:
                us_per_step = ns / 1e3 / args.steps
                print(f"{us_per_step:10,.1f} us/step  x{count_by_name[name]:4d}  "
                      f"{100*ns/total_ns:5.1f}%  {name[:130]}")


if __name__ == "__main__":
    main()
