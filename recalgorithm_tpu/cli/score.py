"""Offline batch scoring with a deployed artifact — no model code.

`python -m recalgorithm_tpu.cli.score --stablehlo <artifact> --data
<split.tfrecord> --vocabulary_dir <dir> --out predictions.csv`

The hermetic twin of the reference's `estimator.predict` -> predictions.csv
step (wide_and_deep.py:370-375): scores a TFRecord split with a StableHLO
export (serving/export.py) and writes the same CSV layout the trainer does
(original userid/feedid string tokens via the inverse vocabulary, one
probability column per task, label columns when present).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stablehlo", required=True)
    p.add_argument("--data", required=True, help="TFRecord split to score")
    p.add_argument("--vocabulary_dir", required=True)
    p.add_argument("--out", default="predictions.csv")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    import numpy as np

    from recalgorithm_tpu.data import pipeline
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.features.vocab import VocabularyStore
    from recalgorithm_tpu.serving.predictor import HLOPredictor

    pred = HLOPredictor(args.stablehlo)
    vocabs = VocabularyStore.from_dir(args.vocabulary_dir)
    schema = wechat_schema(vocabs.sizes())
    data = pipeline.load_dataset(args.data, schema, vocabs, limit=args.limit)
    probs = pred.predict(
        pipeline.batches(data, pred.batch_size, num_epochs=1, shuffle=False)
    )

    ids = {}
    for k in ("userid", "feedid"):
        if k in data.categorical:
            toks = np.asarray([""] + vocabs[k].tokens(), dtype=object)
            ids[k] = toks[data.categorical[k]]
    n = len(next(iter(probs.values())))
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        tasks = pred.tasks
        header = sorted(ids) + [f"{t}_probabilities" for t in tasks]
        header += list(schema.labels)
        w.writerow(header)
        for i in range(n):
            row = [str(ids[c][i]) for c in sorted(ids)]
            row += [f"{probs[t][i]:.6f}" for t in tasks]
            row += [f"{v:g}" for v in data.labels[i]]
            w.writerow(row)
    print(f"wrote {args.out} ({n} rows, artifact {pred.manifest['model']} "
          f"b{pred.batch_size})")


if __name__ == "__main__":
    main()
