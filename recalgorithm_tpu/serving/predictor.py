"""Serving: load exported artifacts and run batch prediction.

Replaces the reference's SavedModel/tf-serving path (BestExporter +
build_parsing_serving_input_receiver_fn, wide_and_deep.py:342-355): the
train loop's best-exporter writes ``export/best_<step>/params.msgpack``
(+ metrics.json); this module loads one and serves probabilities.

The serving input is the framework's standard translated batch (the host
pipeline owns string->id, mirroring how TF-serving owned tf.Example parsing),
so the same artifact serves both offline batch scoring and an online path
that feeds pre-translated ids.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Mapping

import flax
import jax
import numpy as np


class Predictor:
    """Loads a best-export artifact and predicts per-task probabilities."""

    def __init__(self, model, export_dir: str, quantize: bool = False):
        """quantize: serve embedding tables as per-row int8 (serving/
        quantize.py) — ~4x less table memory and gather bandwidth."""
        self.model = model
        with open(os.path.join(export_dir, "params.msgpack"), "rb") as f:
            blob = f.read()
        # template from model.init shapes is not required: from_bytes with a
        # None target returns the raw tree (msgpack state dict)
        self.variables = flax.serialization.msgpack_restore(blob)
        self.qtables = None
        if quantize:
            from recalgorithm_tpu.serving import quantize as qz

            self.qtables = qz.build_qtables(self.variables["params"])
            self.variables["params"] = qz.strip_quantized(
                self.variables["params"], self.qtables
            )
        metrics_path = os.path.join(export_dir, "metrics.json")
        self.export_metrics = (
            json.load(open(metrics_path)) if os.path.exists(metrics_path) else {}
        )
        self._predict = jax.jit(self._predict_impl)

    @staticmethod
    def latest_best(model_dir: str) -> str:
        """Path of the highest-AUC export under ``model_dir`` (best_exports.json)."""
        best_path = os.path.join(model_dir, "best_exports.json")
        with open(best_path) as f:
            best = json.load(f)
        if not best:
            raise FileNotFoundError(f"no exports recorded in {best_path}")
        _, step = max(best)
        return os.path.join(model_dir, "export", f"best_{int(step)}")

    def _predict_impl(self, batch):
        collections = {
            "params": self.variables["params"],
            "batch_stats": self.variables.get("batch_stats", {}),
        }
        if self.qtables is not None:
            collections["qtables"] = self.qtables
        logits, _ = self.model.apply(
            collections, batch, train=False, mutable=["losses"],
        )
        return jax.tree.map(jax.nn.sigmoid, logits)

    def predict_batch(self, batch: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
        probs = self._predict({k: np.asarray(v) for k, v in batch.items()})
        return {k: np.asarray(v) for k, v in probs.items()}

    def predict(
        self, batches: Iterable[Mapping[str, np.ndarray]]
    ) -> dict[str, np.ndarray]:
        outs: dict[str, list[np.ndarray]] = {}
        for hb in batches:
            probs = self.predict_batch(hb)
            w = hb.get("_weights")
            for task, p in probs.items():
                if w is not None:
                    p = p[np.asarray(w) > 0]
                outs.setdefault(task, []).append(p)
        return {t: np.concatenate(v) for t, v in outs.items()}


class HLOPredictor:
    """Serves a StableHLO export (serving/export.py) with NO model code.

    The hermetic deployment shape: the artifact bakes params (f32 or int8
    qtables) and the compiled graph; this class only coerces host batches
    to the manifest's input spec (pad/slice the batch dimension to the
    baked size) and runs the deserialized callable.  Drop-in for
    `BatchingPredictor` — same ``predict_batch(dict) -> dict`` surface.
    """

    def __init__(self, artifact_path: str):
        import json as _json

        from recalgorithm_tpu.serving.export import load_exported

        self._call = load_exported(artifact_path)
        with open(artifact_path + ".manifest.json") as f:
            self.manifest = _json.load(f)
        self.batch_size = int(self.manifest["batch_size"])
        self.inputs = self.manifest["inputs"]
        self.tasks = list(self.manifest["outputs"])

    def predict_batch(self, batch: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
        b = self.batch_size
        coerced = {}
        n = None
        for name, spec in self.inputs.items():
            if name not in batch:
                raise KeyError(f"missing input {name!r} (manifest spec)")
            arr = np.asarray(batch[name], dtype=spec["dtype"])
            n = arr.shape[0] if n is None else n
            if arr.shape[0] > b:
                raise ValueError(
                    f"batch of {arr.shape[0]} rows exceeds the artifact's "
                    f"baked batch size {b}"
                )
            if arr.shape[0] < b:  # zero-pad the tail rows
                pad = np.zeros((b - arr.shape[0],) + arr.shape[1:], arr.dtype)
                arr = np.concatenate([arr, pad])
            coerced[name] = arr
        probs = self._call(coerced)
        return {t: np.asarray(p)[:n] for t, p in probs.items()}

    def predict(
        self, batches: Iterable[Mapping[str, np.ndarray]]
    ) -> dict[str, np.ndarray]:
        """Offline batch scoring over an iterator (Predictor.predict parity);
        padded eval tails (``_weights`` == 0) are dropped."""
        outs: dict[str, list[np.ndarray]] = {}
        for hb in batches:
            probs = self.predict_batch(hb)
            w = hb.get("_weights")
            for task, p in probs.items():
                if w is not None:
                    p = p[np.asarray(w) > 0]
                outs.setdefault(task, []).append(p)
        return {t: np.concatenate(v) for t, v in outs.items()}
