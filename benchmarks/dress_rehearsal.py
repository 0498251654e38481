"""Full-scale dress rehearsal of the real-data path (VERDICT r3 item 2).

The reference's acceptance surface is AUC on the WeChat CSVs, which are not
in this image.  This is the closest attainable stand-in: reference-SIZED
synthetic raw CSVs (data/synth_raw.py: ~7.4M action rows, 106k feeds, real
vocab cardinalities, planted signal) driven through the REAL composed path —

  raw CSVs -> data/etl.py (vectorised pandas + native TFRecord writer)
           -> native C++ reader -> whole-split host pipeline
           -> cli.main training at the reference flags (batch 1024,
              lr 0.005, 10k steps) on the chip
           -> final eval + exact AUC + GAUC + predictions.csv

— producing wall times for every stage, the host feed-rate margin against
the chip's consumption rate, and the training metrics, in
benchmarks/REHEARSAL.json + REHEARSAL.md.  Golden bands (60-1000 steps,
batch 128, synthetic batch streams) never exercise this composed path at
scale; this does.

Phases are resumable: artifacts live under --work_dir and each phase is
skipped when its output exists (the ETL's own sentinels handle its stages).

Run: python benchmarks/dress_rehearsal.py --work_dir /tmp/rehearsal \
         [--scale 1.0] [--models DIN,DeepFM,MMOE] [--train_steps 10000]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_FLAGS = {
    # the reference's common flag block (wide_and_deep.py:12-53; README.md:13)
    "batch_size": 1024,
    "learning_rate": 0.005,
    "train_steps": 10000,
    "shuffle_buffer_size": 10000,
    "save_checkpoints_steps": 1000,
}


def phase_csvs(work: str, scale: float, out: dict) -> None:
    from recalgorithm_tpu.data.synth_raw import RawConfig, generate_raw_csvs

    if os.path.exists(os.path.join(work, "user_action.csv")):
        out["csv_gen"] = {"skipped": True}
        return
    t0 = time.time()
    stats = generate_raw_csvs(work, RawConfig(scale=scale, seed=4))
    out["csv_gen"] = {"wall_s": round(time.time() - t0, 1), **stats}


def phase_etl(work: str, out: dict) -> None:
    import pandas as pd

    from recalgorithm_tpu.data.etl import WeChatETL

    etl = WeChatETL(work + "/", work + "/")
    stages = {}
    t0 = time.time()
    ua, fi = etl._load(pd)
    stages["load"] = round(time.time() - t0, 1)
    t0 = time.time()
    etl._generate_vocabulary(pd, ua, fi)
    stages["vocabulary"] = round(time.time() - t0, 1)
    t0 = time.time()
    frames = etl._generate_features(pd, ua, fi)
    stages["features"] = round(time.time() - t0, 1)
    t0 = time.time()
    train_df, test_df = etl._generate_dataframe(pd, ua, fi, frames)
    stages["dataframe"] = round(time.time() - t0, 1)
    t0 = time.time()
    etl._generate_tfrecord(pd, train_df, "train.tfrecord")
    etl._generate_tfrecord(pd, test_df, "test.tfrecord")
    stages["tfrecord"] = round(time.time() - t0, 1)
    out["etl"] = {
        "stages_s": stages,
        "total_s": round(sum(stages.values()), 1),
        "train_rows": int(len(train_df)),
        "test_rows": int(len(test_df)),
    }


def phase_reader(work: str, out: dict) -> None:
    """Native-reader load rate + host pipeline serve rate = the feed margin."""
    from recalgorithm_tpu.data import pipeline
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.features.vocab import VocabularyStore

    vocabs = VocabularyStore.from_dir(os.path.join(work, "vocabulary"))
    schema = wechat_schema(vocabs.sizes())
    path = os.path.join(work, "tfrecord", "train.tfrecord")
    t0 = time.time()
    data = pipeline.load_dataset(path, schema, vocabs)
    parse_s = time.time() - t0
    # epoch-serve rate: one shuffled epoch through pipeline.batches
    t0 = time.time()
    n = 0
    for b in pipeline.batches(data, 1024, num_epochs=1, shuffle=True, seed=0,
                              drop_remainder=True):
        n += len(b["labels"])
    serve_s = time.time() - t0
    out["reader"] = {
        "rows": data.num_examples,
        "native_parse_rows_per_s": round(data.num_examples / parse_s, 1),
        "epoch_serve_rows_per_s": round(n / serve_s, 1),
    }


def phase_train(work: str, models: list[str], steps: int, out: dict) -> None:
    """cli.main at the reference flags, in-process (the chip run)."""
    from recalgorithm_tpu.cli.main import main as cli_main

    out.setdefault("train", {})
    for model in models:
        if model in out["train"] and "wall_s" in out["train"][model]:
            continue
        flags = [
            "--model", model,
            "--train_data", os.path.join(work, "tfrecord", "train.tfrecord"),
            "--eval_data", os.path.join(work, "tfrecord", "test.tfrecord"),
            "--vocabulary_dir", os.path.join(work, "vocabulary"),
            "--model_dir", os.path.join(work, f"model_{model}"),
            "--predictions_csv", os.path.join(work, f"predictions_{model}.csv"),
            "--train_steps", str(steps),
            "--batch_size", str(REFERENCE_FLAGS["batch_size"]),
            "--learning_rate", str(REFERENCE_FLAGS["learning_rate"]),
            "--shuffle_buffer_size", str(REFERENCE_FLAGS["shuffle_buffer_size"]),
            "--save_checkpoints_steps", str(REFERENCE_FLAGS["save_checkpoints_steps"]),
            # 10k steps at b1024 is ~3.2 epochs of the train split; the
            # reference's tf.data pipeline repeats num_epochs then stops at
            # max_steps — epochs must cover the step budget
            "--num_epochs", "4",
            "--eval_throttle_secs", "600",
        ]
        t0 = time.time()
        final = cli_main(flags)
        wall = time.time() - t0
        pred_csv = os.path.join(work, f"predictions_{model}.csv")
        n_pred = (sum(1 for _ in open(pred_csv)) - 1
                  if os.path.exists(pred_csv) else 0)
        out["train"][model] = {
            "wall_s": round(wall, 1),
            "predictions_rows": n_pred,
            **{k: round(float(v), 5) for k, v in final.items()},
        }


def write_report(out: dict, bench_dir: str) -> None:
    with open(os.path.join(bench_dir, "REHEARSAL.json"), "w") as f:
        json.dump(out, f, indent=2)
    lines = [
        "# Full-scale dress rehearsal (synthetic reference-sized data)",
        "",
        f"Run {out['date']} at commit `{out['commit']}` on "
        f"{out['platform']}; scale {out['scale']} "
        "(phases re-run at different commits carry their own 'commit' "
        "stamps in REHEARSAL.json) "
        f"(reference: 3.32M train / 609k test rows).  Raw CSVs from "
        "data/synth_raw.py (planted user-activity x feed-quality signal) "
        "through the REAL path: data/etl.py -> native reader -> cli.main "
        "at the reference flags (batch 1024, lr 0.005, "
        f"{out['train_steps']} steps).",
        "",
    ]
    if "csv_gen" in out and "wall_s" in out["csv_gen"]:
        g = out["csv_gen"]
        lines.append(f"- raw CSV generation: {g['wall_s']}s "
                     f"({g['rows']:,} action rows)")
    if "etl" in out:
        e = out["etl"]
        lines.append(
            f"- ETL total {e['total_s']}s — stages "
            + ", ".join(f"{k} {v}s" for k, v in e["stages_s"].items())
            + f"; sample table {e['train_rows']:,} train / "
            f"{e['test_rows']:,} test rows"
        )
    if "reader" in out:
        r = out["reader"]
        lines.append(
            f"- native reader {r['native_parse_rows_per_s']:,.0f} rows/s "
            f"parse; host pipeline serves a shuffled epoch at "
            f"{r['epoch_serve_rows_per_s']:,.0f} rows/s"
        )
    if out.get("platform") in ("tpu", "axon"):
        lines.append(
            "- feed-margin note: on this image the chip is reached over a "
            "terminal tunnel, so the per-step host->device batch transfer "
            "(~tunnel RTT per b1024 step) dominates the training wall times "
            "below — the chip itself consumes ~600k ex/s at b1024 "
            "(BENCH_r03) and the 1-core host pipeline serves ~110k rows/s; "
            "on directly-attached hardware the run is host-pipeline-bound "
            "(size feeder hosts at ~110k rows/s/core)."
        )
    for m, t in out.get("train", {}).items():
        metrics = ", ".join(
            f"{k} {v}" for k, v in sorted(t.items())
            if k.endswith(("auc", "gauc")) and "accuracy" not in k
        )
        lines.append(
            f"- **{m}**: {t['wall_s']}s wall for {out['train_steps']} steps "
            f"(b1024); predictions.csv {t['predictions_rows']:,} rows; "
            f"{metrics}"
        )
    lines.append("")
    with open(os.path.join(bench_dir, "REHEARSAL.md"), "w") as f:
        f.write("\n".join(lines))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", required=True)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--models", default="DIN,DeepFM,MMOE")
    p.add_argument("--train_steps", type=int,
                   default=REFERENCE_FLAGS["train_steps"])
    p.add_argument("--phases", default="csvs,etl,reader,train",
                   help="comma subset to run (artifacts make phases cheap "
                        "to re-enter)")
    args = p.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)
    bench_dir = os.path.dirname(os.path.abspath(__file__))

    state_path = os.path.join(bench_dir, "REHEARSAL.json")
    out: dict = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            out = json.load(f)
    from benchmarks.provenance import git_commit

    commit = git_commit()
    import jax

    out.update(date=datetime.date.today().isoformat(), commit=commit,
               scale=args.scale, train_steps=args.train_steps,
               platform=jax.devices()[0].platform)

    # each phase carries its own measured-at stamp: REHEARSAL.json doubles
    # as resume state, so a later partial re-run at a newer commit must not
    # relabel older phases' numbers (round-4 review finding)
    from benchmarks.provenance import stamp as phase_stamp

    phases = args.phases.split(",")
    if "csvs" in phases:
        phase_csvs(args.work_dir, args.scale, out)
        out["csv_gen"].update(phase_stamp())
        write_report(out, bench_dir)
    if "etl" in phases:
        phase_etl(args.work_dir, out)
        out["etl"].update(phase_stamp())
        write_report(out, bench_dir)
    if "reader" in phases:
        phase_reader(args.work_dir, out)
        out["reader"].update(phase_stamp())
        write_report(out, bench_dir)
    if "train" in phases:
        phase_train(args.work_dir, args.models.split(","),
                    args.train_steps, out)
        for m in out.get("train", {}).values():
            m.setdefault("commit", phase_stamp()["commit"])
        write_report(out, bench_dir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
