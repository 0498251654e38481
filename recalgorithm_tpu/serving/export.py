"""Ahead-of-time serving export via jax.export (StableHLO).

The reference ships TF-Serving SavedModels (BestExporter +
build_parsing_serving_input_receiver_fn, wide_and_deep.py:342-355).  The
TPU-native equivalent is a serialized StableHLO function: hermetic, runnable
by any PJRT runtime (TPU/CPU/GPU serving stacks) without Python or model
code, with the trained params baked in as constants or passed as inputs.

``export_stablehlo`` exports the model's inference function (translated-id
batch -> per-task probabilities) for a fixed batch size; ``load_exported``
round-trips it for verification.
"""

from __future__ import annotations

import os
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _example_batch(schema, batch_size: int) -> dict[str, jax.ShapeDtypeStruct]:
    spec = schema.batch_spec(batch_size)
    spec.pop("labels", None)
    return {
        name: jax.ShapeDtypeStruct(shape, dtype)
        for name, (shape, dtype) in spec.items()
    }


def export_stablehlo(
    model,
    variables: Mapping,
    schema,
    batch_size: int,
    out_path: str,
    quantize_embeddings: bool = False,
) -> None:
    """Serialize the inference fn (ids -> sigmoid probabilities) to out_path.

    quantize_embeddings: bake embedding tables as per-row int8 + f32 scales
    (serving/quantize.py) instead of f32 — ~4x smaller artifact and gather
    traffic for table-dominated CTR models.  The replaced f32 tables never
    enter the trace, so they are absent from the serialized constants.
    """
    from jax import export as jexport

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    collections = {"params": params, "batch_stats": batch_stats}
    if quantize_embeddings:
        from recalgorithm_tpu.serving import quantize as qz

        qtables = qz.build_qtables(params)
        collections["params"] = qz.strip_quantized(params, qtables)
        collections["qtables"] = qtables

    def serve(batch):
        logits, _ = model.apply(
            collections, batch, train=False, mutable=["losses"],
        )
        return jax.tree.map(jax.nn.sigmoid, logits)

    args = (_example_batch(schema, batch_size),)
    exported = jexport.export(jax.jit(serve))(*args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    # sidecar manifest: everything a serving stack needs to validate the
    # artifact without deserializing it (model identity, input spec,
    # quantization) — SavedModel-signature parity in spirit
    import json

    manifest = {
        "model": type(model).__name__,
        "batch_size": batch_size,
        "quantized_embeddings": quantize_embeddings,
        "inputs": {
            name: {"shape": list(s.shape), "dtype": str(s.dtype)}
            for name, s in args[0].items()
        },
        "outputs": list(getattr(model.config, "task_names", ())),
        "artifact_bytes": len(blob),
    }
    with open(out_path + ".manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


def load_exported(path: str):
    """Deserialize an exported artifact; returns a callable(batch) -> probs."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(batch: Mapping[str, np.ndarray]):
        batch = {
            k: jnp.asarray(v) for k, v in batch.items()
            if k not in ("labels", "_weights")
        }
        return exported.call(batch)

    return call
