"""Scalar summaries + profiling hooks.

The reference's observability stack is tf.summary scalars/histograms for
TensorBoard, LoggingTensorHook console prints, and a ProfilerHook
(SURVEY.md §5).  TPU-native equivalents:

  * SummaryWriter — append-only JSONL of (step, tag, value) that any tool can
    consume; if TensorBoard's pure-python writer is importable it mirrors
    scalars there too (optional, never required),
  * profile() — context manager around jax.profiler.trace producing an XProf/
    TensorBoard trace directory (ProfilerHook parity, pnn.py:246-248).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Mapping


class SummaryWriter:
    """JSONL scalar sink with optional TensorBoard mirroring."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a", buffering=1)
        self._tb = None
        try:  # optional: mirror to TensorBoard if available in the image
            from flax.metrics import tensorboard  # type: ignore

            self._tb = tensorboard.SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def scalars(self, step: int, values: Mapping[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in values.items():
                self._tb.scalar(k, float(v), step)

    def histogram(self, step: int, tag: str, values, bins: int = 30) -> None:
        """tf.summary.histogram parity: binned counts + moments as JSONL."""
        import numpy as np

        v = np.asarray(values, dtype=np.float64).ravel()
        counts, edges = np.histogram(v, bins=bins)
        rec = {
            "step": int(step), "time": time.time(), "histogram": tag,
            "mean": float(v.mean()), "std": float(v.std()),
            "min": float(v.min()), "max": float(v.max()),
            "counts": counts.tolist(),
            "edges": [float(e) for e in edges],
        }
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            try:
                self._tb.histogram(tag, v, step)
            except Exception:
                pass

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile(log_dir: str, enabled: bool = True):
    """jax.profiler trace scope (view with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
