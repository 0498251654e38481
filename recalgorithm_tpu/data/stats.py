"""Dataset statistics reporter — the reference EDA notebook's numbers as code.

`python -m recalgorithm_tpu.data.stats --tfrecord <file> --vocabulary_dir <dir>`
prints example counts, per-label positive rates, sequence-length histograms
and vocab sizes (reference dataset/wechat_algo_data1/EDA.ipynb's headline
outputs: 7.3M actions, 106,444 feeds, per-action rates).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from recalgorithm_tpu.data import pipeline
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.features.vocab import VocabularyStore


def compute_stats(data: pipeline.DatasetArrays, schema) -> dict:
    stats: dict = {"num_examples": data.num_examples}
    stats["label_positive_rate"] = {
        name: round(float(data.labels[:, i].mean()), 6)
        for i, name in enumerate(schema.labels)
    }
    stats["dense_mean"] = {
        name: round(float(data.dense[:, i].mean()), 4)
        for i, name in enumerate(schema.dense_names)
    }
    for name, (ids, lens) in data.sequences.items():
        stats[f"{name}_length"] = {
            "mean": round(float(lens.mean()), 3),
            "p50": int(np.percentile(lens, 50)),
            "p99": int(np.percentile(lens, 99)),
            "max": int(lens.max()) if len(lens) else 0,
            "empty_frac": round(float((lens == 0).mean()), 4),
        }
    for name, arr in data.categorical.items():
        stats[f"{name}_oov_frac"] = round(float((arr == 0).mean()), 6)
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tfrecord", required=True)
    p.add_argument("--vocabulary_dir", required=True)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()
    vocabs = VocabularyStore.from_dir(args.vocabulary_dir)
    schema = wechat_schema(vocabs.sizes())
    data = pipeline.load_dataset(args.tfrecord, schema, vocabs, limit=args.limit)
    stats = compute_stats(data, schema)
    stats["vocab_sizes"] = vocabs.sizes()
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
