"""Host input-pipeline throughput: numpy batch assembly + prefetch.

The device step is 1-6 ms at batch 4096 (benchmarks/RESULTS.md), so the host
must assemble >0.7-4M rows/s to keep the chip fed.  This measures the
steady-state rate of `pipeline.batches` (permutation shuffle + fancy-index
row gather + pad) and the one-deep `prefetch` wrapper, on WeChat-shaped
synthetic arrays.

Run: python benchmarks/bench_pipeline.py [--rows 500000] [--batch_size 4096]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_arrays(rows: int):
    from recalgorithm_tpu.data.pipeline import DatasetArrays
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=0))
    schema = wechat_schema(gen.vocab_sizes())
    chunks = []
    got = 0
    i = 0
    while got < rows:
        b = gen.batch(min(65536, rows - got), i)
        chunks.append(b)
        got += len(b["labels"])
        i += 1
    cat_names = [f.name for f in schema.categorical]
    seq_names = [f.name for f in schema.sequence]
    return DatasetArrays(
        dense=np.concatenate([c["dense"] for c in chunks]),
        categorical={n: np.concatenate([c[n] for c in chunks]) for n in cat_names},
        sequences={
            n: (
                np.concatenate([c[n] for c in chunks]),
                np.concatenate([c[f"{n}_len"] for c in chunks]),
            )
            for n in seq_names
        },
        labels=np.concatenate([c["labels"] for c in chunks]),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=500_000)
    p.add_argument("--batch_size", type=int, default=4096)
    args = p.parse_args()

    from recalgorithm_tpu.data import pipeline

    data = make_arrays(args.rows)
    results = {}
    for name, wrap in (("batches", lambda it: it),
                       ("batches+prefetch", pipeline.prefetch)):
        it = wrap(pipeline.batches(
            data, args.batch_size, num_epochs=2, shuffle=True, seed=1,
            drop_remainder=True,
        ))
        n = 0
        next(it)  # warm (first call pays the permutation)
        t0 = time.perf_counter()
        for b in it:
            n += len(b["labels"])
        dt = time.perf_counter() - t0
        results[name] = round(n / dt, 1)
    out = {
        "metric": "host_pipeline_rows_per_s",
        "batch_size": args.batch_size,
        **results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
