"""CLI entrypoint: `python -m recalgorithm_tpu.cli.main --model DIN [flags]`.

Flag-compatible with the reference's per-script tf.app.flags headers
(wide_and_deep.py:12-53 and per-model extras): the common training flags keep
their names, and every field of the selected model's config dataclass becomes
a CLI flag automatically (comma-separated lists for tuple fields, so
`--hidden_units 512,256,128` works exactly as in the reference's result.md
sweep commands).

Run modes:
  * real data: --train_data/--eval_data point at reference-format
    SequenceExample TFRecords, --vocabulary_dir at the ETL's vocabulary txts,
  * --synthetic: WeChat-shaped synthetic stream (smoke tests / benchmarks).

After training: final evaluate (metrics printed), predictions.csv with
per-task probabilities joined with labels (reference wide_and_deep.py:360-375).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import typing

import numpy as np


def _add_dataclass_flags(parser: argparse.ArgumentParser, cfg_cls) -> None:
    # `from __future__ import annotations` makes every field type a string;
    # get_type_hints resolves them in the dataclass's OWN module namespace
    # (a bare eval here would break on any type not imported into this one).
    hints = typing.get_type_hints(cfg_cls)
    for f in dataclasses.fields(cfg_cls):
        name = "--" + f.name
        default = f.default
        ftype = hints.get(f.name, str)
        origin = typing.get_origin(ftype)
        if ftype is bool:
            parser.add_argument(
                name, type=lambda s: s.lower() in ("true", "1", "yes"),
                default=default,
            )
        elif origin is tuple:
            args = typing.get_args(ftype)
            elem = args[0] if args else str
            if typing.get_origin(elem) is tuple:
                # nested pairs (e.g. task_loss_weights): "task:w,task:w"
                k_t, v_t = typing.get_args(elem)

                def _pairs(s, kt=k_t, vt=v_t):
                    return tuple(
                        (kt(k), vt(v))
                        for k, v in (x.split(":", 1) for x in s.split(",") if x)
                    )

                parser.add_argument(name, type=_pairs, default=default)
            else:
                parser.add_argument(
                    name,
                    type=lambda s, e=elem: tuple(e(x) for x in s.split(",") if x),
                    default=default,
                )
        elif ftype in (int, float, str):
            parser.add_argument(name, type=ftype, default=default)
        else:
            parser.add_argument(name, type=str, default=default)


def build_parser(model_name: str | None = None) -> argparse.ArgumentParser:
    from recalgorithm_tpu.models import MODEL_REGISTRY

    parser = argparse.ArgumentParser(description="recalgorithm_tpu trainer")
    parser.add_argument(
        "--model", default=model_name, required=model_name is None,
        choices=sorted(MODEL_REGISTRY),
    )
    parser.add_argument("--model_dir", default="./model_dir")
    parser.add_argument("--output_dir", default="./output_dir")
    parser.add_argument(
        "--train_data",
        default="../../dataset/wechat_algo_data1/tfrecord/train.tfrecord",
    )
    parser.add_argument(
        "--eval_data",
        default="../../dataset/wechat_algo_data1/tfrecord/test.tfrecord",
    )
    parser.add_argument(
        "--vocabulary_dir", default="../../dataset/wechat_algo_data1/vocabulary/"
    )
    parser.add_argument(
        "--dataset", default="wechat", choices=("wechat", "douban"),
        help="schema family: 'wechat' (the reference dataset) or 'douban' "
             "(the reference's abandoned second dataset, completed in "
             "data/douban.py; train schema-driven models like GenericDNN "
             "on its ETL artifacts)",
    )
    parser.add_argument("--synthetic", action="store_true",
                        help="train on WeChat-shaped synthetic data")
    parser.add_argument("--synthetic_vocab_scale", type=float, default=0.01)
    parser.add_argument("--limit_examples", type=int, default=None,
                        help="cap examples read from TFRecords (debug). "
                             "Whole-load mode applies the cap GLOBALLY "
                             "(before host sharding); --stream mode applies "
                             "it PER HOST (strided chunk ownership means no "
                             "host sees a contiguous global prefix), so "
                             "nproc hosts score up to nproc*limit rows")
    parser.add_argument("--stream", action="store_true",
                        help="bounded-memory streaming input for BOTH splits "
                             "(chunked native reads; train adds a "
                             "shuffle-buffer pool) instead of whole-split "
                             "load; for splits larger than RAM")
    parser.add_argument("--stream_chunk_records", type=int, default=65536,
                        help="records per chunked native read in --stream "
                             "mode (peak RAM ~ one chunk + shuffle pool)")
    parser.add_argument("--stream_cache_dir", type=str, default=None,
                        help="directory for the on-disk translated-chunk "
                             "cache in --stream mode: epoch 1 spills each "
                             "chunk's vocab-translated arrays, epochs >= 2 "
                             "and repeat eval passes serve from disk at "
                             "whole-load speed (still one-chunk peak RAM); "
                             "costs ~split-size disk under this dir")
    parser.add_argument("--eval_every_steps", type=int, default=0)
    parser.add_argument(
        "--eval_throttle_secs", type=float, default=600.0,
        help="evaluate when this many seconds passed since the last eval "
             "(reference EvalSpec(throttle_secs=600)); 0 disables",
    )
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--grad_accum_steps", type=int, default=1,
                        help="accumulate k micro-batch gradients before each "
                        "optimizer step (effective batch = k x batch_size)")
    parser.add_argument("--num_model_shards", type=int, default=1,
                        help="mesh 'model' axis size (1 = pure data parallel)")
    parser.add_argument("--no_mesh", action="store_true",
                        help="single-device mode without a mesh")
    parser.add_argument("--shard_map_embeddings", action="store_true",
                        help="use the explicit shard_map embedding exchange "
                             "instead of partitioner-derived collectives")
    parser.add_argument("--no_compact_grad_scatter", action="store_true",
                        help="disable the PAD-compacted sequence-gradient "
                             "scatter (on by default single-chip; dense "
                             "batches auto-dispatch to the plain step)")
    parser.add_argument("--predictions_csv", default="predictions.csv")
    parser.add_argument("--eval_recall_at", type=int, default=0,
                        help="for retrieval models (TwoTower): after "
                        "training, build the item corpus from the eval "
                        "split and report Recall@K at this K")
    parser.add_argument("--export_stablehlo", default=None,
                        help="after training, write a hermetic StableHLO "
                        "serving artifact (ids -> probabilities) here")
    parser.add_argument("--export_quantized", action="store_true",
                        help="quantize embedding tables to per-row int8 in "
                        "the StableHLO artifact (~4x smaller)")
    parser.add_argument("--serving_batch_size", type=int, default=0,
                        help="batch size baked into the StableHLO export "
                        "(0 = training batch size)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of training here")
    return parser


def main(argv: list[str] | None = None, model_name: str | None = None) -> dict:
    # parse --model first so model-specific flags can be registered
    import jax

    from recalgorithm_tpu.features.schema import douban_schema, wechat_schema
    from recalgorithm_tpu.models import MODEL_REGISTRY
    from recalgorithm_tpu.parallel import mesh as mesh_lib
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

    from recalgorithm_tpu.parallel import multihost

    multihost.initialize()  # no-op single-process; TPU pods auto-discover

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--list_models" in argv:
        for name in sorted(MODEL_REGISTRY):
            _, mc = MODEL_REGISTRY[name]
            # flax dataclasses overwrite class docstrings with the ctor
            # signature — the module docstring's first line is the summary
            doc = (sys.modules[mc.__module__].__doc__ or "").strip()
            print(f"{name:20s} {doc.splitlines()[0] if doc else ''}")
        return {}
    pre = build_parser(model_name)
    pre_args, _ = pre.parse_known_args(argv)
    cfg_cls, model_cls = MODEL_REGISTRY[pre_args.model]

    parser = build_parser(model_name)
    _add_dataclass_flags(parser, cfg_cls)
    args = parser.parse_args(argv)

    cfg_kwargs = {
        f.name: getattr(args, f.name) for f in dataclasses.fields(cfg_cls)
    }
    cfg = cfg_cls(**cfg_kwargs)
    schema_fn = {"wechat": wechat_schema, "douban": douban_schema}[args.dataset]

    # ---- data
    if args.synthetic:
        from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig

        gen = SyntheticWeChat(
            schema_fn(),
            SyntheticConfig(seed=args.seed, vocab_scale=args.synthetic_vocab_scale),
        )
        schema = schema_fn(gen.vocab_sizes())
        train_iter = gen.batches(cfg.batch_size, cfg.train_steps)
        eval_fn = lambda: gen.batches(cfg.batch_size, 16, start_seed=10_000_000)
        eval_labels = None
        eval_ids = {}
        eval_groups = None
    else:
        from recalgorithm_tpu.data import pipeline
        from recalgorithm_tpu.features.vocab import VocabularyStore

        vocabs = VocabularyStore.from_dir(args.vocabulary_dir)
        schema = schema_fn(vocabs.sizes())
        if args.stream:
            train_iter = pipeline.prefetch(
                pipeline.stream_batches(
                    args.train_data, schema, vocabs, cfg.batch_size,
                    num_epochs=cfg.num_epochs,
                    shuffle_buffer_size=max(cfg.shuffle_buffer_size, 1),
                    seed=args.seed, max_steps=cfg.train_steps,
                    chunk_records=args.stream_chunk_records,
                    limit=args.limit_examples,
                    host_index=jax.process_index(),
                    host_count=jax.process_count(),
                    cache_dir=args.stream_cache_dir,
                )
            )
            # strided chunk ownership can leave hosts with unequal batch
            # counts at end-of-data — coordinate termination so no host
            # enters a collective step the others have already left
            # (no-op single-process; wrapped OUTSIDE prefetch so the
            # collective runs on the consumer thread)
            from recalgorithm_tpu.parallel import multihost

            train_iter = multihost.synchronized_iterator(train_iter)
        else:
            train_arrays = pipeline.shard_for_host(
                pipeline.load_dataset(
                    args.train_data, schema, vocabs, limit=args.limit_examples
                )
            )
            train_iter = pipeline.prefetch(
                pipeline.batches(
                    train_arrays, cfg.batch_size, num_epochs=cfg.num_epochs,
                    shuffle=cfg.shuffle_buffer_size > 0, seed=args.seed,
                    drop_remainder=True, max_steps=cfg.train_steps,
                )
            )
            if jax.process_count() > 1:
                # host shards can also yield unequal batch counts here
                # (row counts differing across hosts + drop_remainder) —
                # same lock-step termination as the streaming branch
                from recalgorithm_tpu.parallel import multihost

                train_iter = multihost.synchronized_iterator(train_iter)
        # ---- eval input: per-host shards (each example scored exactly once
        # globally; the round-3 bug fed every host the FULL split, so the
        # assembled mesh batches scored each row process_count times).  All
        # eval batches carry `_weights` (pad mask) and `_index` (global row
        # id) so the predict path can reassemble file order after the mesh
        # interleaves host shards.
        nproc = jax.process_count()
        if args.stream:
            # bounded-RAM eval: chunked strided per-host stream; multi-host
            # hosts pad into lock-step (no row lost, no collective skew)
            def eval_fn():
                it = pipeline.stream_eval_batches(
                    args.eval_data, schema, vocabs, cfg.batch_size,
                    chunk_records=args.stream_chunk_records,
                    limit=args.limit_examples,
                    host_index=jax.process_index(), host_count=nproc,
                    cache_dir=args.stream_cache_dir,
                )
                if nproc > 1:
                    it = multihost.aligned_iterator(
                        it,
                        lambda: pipeline.zero_batch(schema, cfg.batch_size),
                    )
                return it
        else:
            eval_arrays = pipeline.load_dataset(
                args.eval_data, schema, vocabs, limit=args.limit_examples
            )
            if nproc > 1:
                n_eval_total = eval_arrays.num_examples
                start, _ = multihost.host_shard_range(n_eval_total)
                eval_shard = pipeline.shard_for_host(eval_arrays)
                del eval_arrays  # keep only this host's rows resident
                # every host steps the batch count of the LARGEST shard
                # (the last host holds the remainder); short hosts emit
                # zero-weight padding batches
                per = n_eval_total // nproc
                nb = -(-(per + n_eval_total % nproc) // cfg.batch_size)
                eval_fn = lambda: pipeline.eval_batches(
                    eval_shard, cfg.batch_size, num_batches=nb,
                    index_offset=start,
                )
            else:
                eval_fn = lambda: pipeline.eval_batches(
                    eval_arrays, cfg.batch_size
                )
        eval_labels = None  # filled from the collected predict columns below
        eval_groups = None
        eval_ids = {}

    # ---- model + trainer
    # schema-driven models (GenericDNN) default to the schema's first label
    task_names = tuple(cfg.task_names) or (schema.labels[0],)
    model = model_cls(config=cfg, schema=schema)
    opt_name = getattr(cfg, "optimizer", "adam")
    # dual FTRL/deep optimizer for any model exposing a wide-param split
    # (class check, not name: WideAndDeepBuiltin aliases the same class)
    if hasattr(model_cls, "wide_param_predicate"):
        optimizer = optimizers.dual_wide_deep(
            cfg.wide_part_learning_rate,
            cfg.deep_part_optimizer,
            cfg.deep_part_learning_rate,
            model_cls.wide_param_predicate,
        )
    else:
        lr = optimizers.make_schedule(
            cfg.learning_rate,
            schedule=getattr(cfg, "lr_schedule", "constant"),
            warmup_steps=getattr(cfg, "warmup_steps", 0),
            decay_steps=getattr(cfg, "decay_steps", 0),
        )
        optimizer = optimizers.build(opt_name, lr)

    mesh = None
    if not args.no_mesh and len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh(num_model=args.num_model_shards)

    trainer = Trainer(
        model,
        task_names,
        optimizer,
        TrainerConfig(
            model_dir=args.model_dir,
            train_steps=cfg.train_steps,
            log_every=args.log_every,
            eval_every_steps=args.eval_every_steps,
            eval_throttle_secs=args.eval_throttle_secs,
            save_checkpoints_steps=cfg.save_checkpoints_steps,
            seed=args.seed,
            shard_map_embeddings=args.shard_map_embeddings,
            compact_grad_scatter=not args.no_compact_grad_scatter,
            grad_accum_steps=args.grad_accum_steps,
            scoped_vmem_limit_kib=cfg.scoped_vmem_limit_kib,
        ),
        mesh=mesh,
    )
    from recalgorithm_tpu.utils.summary import profile

    with profile(args.profile_dir or "", enabled=args.profile_dir is not None):
        state, final_eval = trainer.train_and_evaluate(train_iter, eval_fn)
    for key in sorted(final_eval):
        print(f"{key}: {final_eval[key]}")

    # ---- predictions.csv (reference wide_and_deep.py:370-375)
    if args.synthetic:
        probs = trainer.predict(state, eval_fn())
    else:
        # Predict with row-aligned metadata gathered through the mesh: the
        # per-batch outputs are GLOBAL arrays (every process gets the full
        # set), `_index` reassembles original file order, and the original
        # string tokens for the id columns come from the inverse vocab —
        # the reference joins predictions with the raw test CSV so
        # predictions.csv carries real userid/feedid strings
        # (wide_and_deep.py:370-375); vocab-remapped integers would
        # mismatch every row of any downstream join.
        # first two categorical fields are the user/item ids in every
        # schema (userid/feedid for WeChat, USER_MD5/MOVIE_ID for Douban)
        id_cols = list(schema.categorical_names[:2])
        probs, collected = trainer.predict(
            state, eval_fn(), collect=("labels", "_index", *id_cols)
        )
        order = np.argsort(collected["_index"], kind="stable")
        probs = {t: v[order] for t, v in probs.items()}
        collected = {k: v[order] for k, v in collected.items()}
        idx = collected["_index"]
        assert len(idx) == len(np.unique(idx)), (
            "duplicate eval rows in predictions — host sharding fed some "
            "example to more than one process"
        )
        if args.limit_examples is None:
            assert np.array_equal(idx, np.arange(len(idx))), (
                "eval row ids are not contiguous from 0 — some example was "
                "never scored"
            )
        eval_labels = collected["labels"]
        eval_groups = collected.get(schema.categorical_names[0])
        for k in id_cols:
            toks = np.asarray(
                [""] + vocabs[schema.vocab_of(k)].tokens(), dtype=object
            )
            eval_ids[k] = toks[collected[k]]

    # Unbinned rank AUC beside the 200-bin streaming approximation: the
    # binned metric matches tf.metrics.auc for comparability, the exact one
    # is the ground truth it approximates (train/metrics.py:exact_auc).
    if eval_labels is not None:
        from recalgorithm_tpu.train.metrics import exact_auc, grouped_auc

        label_idx = {name: i for i, name in enumerate(schema.labels)}
        for t in task_names:
            if t in label_idx and len(probs[t]) == len(eval_labels):
                v = exact_auc(eval_labels[:, label_idx[t]], probs[t])
                final_eval[f"{t}_exact_auc"] = v
                print(f"{t}_exact_auc: {v}")
                # per-user GAUC (DIN paper KDD'18 §6.1; reference reports
                # only global AUC).  OOV users all translate to id 0 and
                # would otherwise merge into one pseudo-user whose pooled
                # impressions rank against each other — exclude them.
                if eval_groups is not None and len(eval_groups) == len(probs[t]):
                    known = np.asarray(eval_groups) > 0
                    g = grouped_auc(
                        eval_labels[known, label_idx[t]],
                        np.asarray(probs[t])[known],
                        np.asarray(eval_groups)[known],
                    )
                    final_eval[f"{t}_gauc"] = g
                    print(f"{t}_gauc: {g}")

    import csv

    if jax.process_index() == 0:  # every process holds the same global rows
        if os.path.dirname(args.predictions_csv):
            os.makedirs(os.path.dirname(args.predictions_csv), exist_ok=True)
        with open(args.predictions_csv, "w", newline="") as f:
            writer = csv.writer(f)
            tasks = list(task_names)
            id_cols = sorted(eval_ids)
            header = id_cols + [f"{t}_probabilities" for t in tasks]
            if eval_labels is not None:
                header += list(schema.labels)
            writer.writerow(header)
            n = len(next(iter(probs.values())))
            for c in id_cols:
                assert len(eval_ids[c]) == n, (
                    f"id column {c!r} has {len(eval_ids[c])} rows but "
                    f"predictions have {n}; refusing to write a misaligned "
                    "predictions.csv"
                )
            for i in range(n):
                row = [str(eval_ids[c][i]) for c in id_cols]
                row += [f"{probs[t][i]:.6f}" for t in tasks]
                if eval_labels is not None and i < len(eval_labels):
                    row += [f"{v:g}" for v in eval_labels[i]]
                writer.writerow(row)
        print(f"wrote {args.predictions_csv}")

    # Host-gathered variables are needed by Recall@K and the StableHLO
    # export; the gather is a COLLECTIVE (process_allgather) entered on
    # every process, and the full table tree is large — gather exactly once
    want_recall = args.eval_recall_at and hasattr(model, "item_embedding")
    host_variables = None
    if want_recall or args.export_stablehlo:
        from recalgorithm_tpu.train.loop import _gather_to_host

        host_variables = _gather_to_host(
            {"params": state.params, "batch_stats": state.batch_stats}
        )

    # ---- retrieval quality (TwoTower family): offline Recall@K over the
    # eval split — the candidate-generation acceptance metric (no reference
    # counterpart; the reference zoo is ranking-only)
    if want_recall:
        from recalgorithm_tpu.serving.retrieval import Retriever

        if jax.process_index() == 0:
            retr = Retriever(model, host_variables)
            n_corpus = retr.build_corpus(eval_fn())
            recall = retr.recall_at_k(eval_fn(), k=args.eval_recall_at)
            final_eval[f"recall_at_{args.eval_recall_at}"] = recall
            print(f"recall_at_{args.eval_recall_at}: {recall:.4f} "
                  f"(corpus {n_corpus}, random ~"
                  f"{min(args.eval_recall_at / n_corpus, 1.0):.4f})")

    # ---- hermetic serving artifact (reference exports a SavedModel at the
    # end of every run; here: StableHLO, runnable by any PJRT runtime)
    if args.export_stablehlo:
        from recalgorithm_tpu.serving.export import export_stablehlo

        # only the file write is gated on process 0; the collective gather
        # above ran on every process
        if jax.process_index() == 0:
            export_stablehlo(
                model, host_variables, schema,
                batch_size=args.serving_batch_size or cfg.batch_size,
                out_path=args.export_stablehlo,
                quantize_embeddings=args.export_quantized,
            )
            print(f"wrote {args.export_stablehlo} "
                  f"({os.path.getsize(args.export_stablehlo)} bytes, "
                  f"quantized={args.export_quantized})")
    return final_eval


if __name__ == "__main__":
    main()
