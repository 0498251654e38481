"""Post-training int8 quantization of embedding tables for serving.

Beyond-reference capability (the reference serves f32 SavedModels,
wide_and_deep.py:342-355): embedding tables dominate a CTR model's serving
footprint (the WeChat feedid table alone is |V|x16 f32 while every dense
tower is a few hundred KB), and the serving-time lookup is bandwidth-bound.
Symmetric per-row int8 — q = round(x / s), s = max|row| / 127 — cuts the
table bytes ~4x and the gather's HBM traffic with it; the dequantize
(int8 row * f32 per-row scale) fuses into the gather's consumers.

Design: quantized tables ride a read-only ``qtables`` flax collection whose
tree structure mirrors ``params`` (each table leaf ``name`` becomes two
leaves ``name__q`` int8 (rows, dim) and ``name__scale`` f32 (rows, 1)).
``EmbeddingCollection`` checks the collection at lookup time, so scope-path
resolution guarantees the right table is substituted with NO model-code
changes, and models that never receive the collection are untouched.  Only
gather-path tables (rows > DENSE_LOOKUP_MAX_ROWS) are quantized: the small
dense-lookup tables go through one-hot matmuls where int8 buys nothing.

Training is untouched — this is serving-only (export_stablehlo /
Predictor), the standard post-training-quantization deployment shape.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from recalgorithm_tpu.embed.tables import DENSE_LOOKUP_MAX_ROWS
from recalgorithm_tpu.parallel.mesh import is_embedding_table_path

# Gather-path tables only; dense-lookup tables stay f32 (see module doc).
MIN_QUANT_ROWS = DENSE_LOOKUP_MAX_ROWS + 1


def quantize_table(x) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8: returns (q int8 (R, K), scale f32 (R, 1)).

    scale = max|row| / 127 (1.0 for all-zero rows so dequant stays exact);
    worst-case per-element error is scale/2, i.e. <= 0.4% of the row's
    absmax.  dim-1 tables (FM first-order weights) reconstruct exactly.
    """
    x = np.asarray(x, np.float32)
    absmax = np.max(np.abs(x), axis=1, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
    return q, scale


def _walk(params, fn, path=()):
    """Depth-first over a nested-dict param tree, calling fn(path, leaf)."""
    for k, v in params.items():
        p = path + (k,)
        if isinstance(v, Mapping):
            _walk(v, fn, p)
        else:
            fn(p, v)


def _is_quantizable(path, leaf, min_rows: int) -> bool:
    return (
        is_embedding_table_path(path)
        and getattr(leaf, "ndim", 0) == 2
        and leaf.shape[0] >= min_rows
    )


def build_qtables(params, min_rows: int = MIN_QUANT_ROWS) -> dict:
    """``qtables`` collection mirroring ``params``: every embedding-table
    leaf with >= min_rows rows becomes ``<name>__q`` + ``<name>__scale``."""
    out: dict = {}

    def visit(path, leaf):
        if not _is_quantizable(path, leaf, min_rows):
            return
        q, scale = quantize_table(np.asarray(leaf))
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[f"{path[-1]}__q"] = q
        node[f"{path[-1]}__scale"] = scale

    _walk(params, visit)
    return out


def strip_quantized(params, qtables) -> dict:
    """Copy of ``params`` with every quantized table replaced by a
    zero-strided dummy of the same shape/dtype (numpy broadcast view — no
    memory).  The lookup never reads these (the qtables branch wins), flax
    only requires the leaf to exist; jit/export trace never touches them so
    they are dead-code-eliminated from compiled artifacts.
    """

    def sub(params_node, q_node):
        out = {}
        for k, v in params_node.items():
            if isinstance(v, Mapping):
                out[k] = sub(v, q_node.get(k, {})) if isinstance(
                    q_node.get(k, {}), Mapping) else v
            elif f"{k}__q" in q_node:
                dtype = np.asarray(v).dtype if not hasattr(v, "dtype") else v.dtype
                out[k] = np.broadcast_to(
                    np.zeros((), dtype), getattr(v, "shape"))
            else:
                out[k] = v
        return out

    return sub(params, qtables)


def quantized_bytes(qtables) -> int:
    """Total payload bytes of a qtables tree (reporting/telemetry)."""
    total = 0

    def visit(path, leaf):
        nonlocal total
        total += np.asarray(leaf).nbytes

    _walk(qtables, visit)
    return total
