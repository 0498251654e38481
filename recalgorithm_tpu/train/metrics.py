"""Streaming metrics: binned AUC (tf.metrics.auc parity), accuracy, mean loss.

The reference's north-star metric is streaming ``tf.metrics.auc`` with its
default 200 thresholds (e.g. wide_and_deep.py:243).  ``StreamingAUC``
reproduces that binning so eval numbers are directly comparable, as a pure
pytree-of-counts state that lives on device and updates inside the jitted
eval step (one pass, O(num_thresholds) memory, trivially data-parallel — the
counts just psum across the mesh).

``exact_auc`` is the rank-based (Mann-Whitney) AUC computed on host for final
reporting; it is the unbinned ground truth the binned metric approximates.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

NUM_THRESHOLDS = 200  # tf.metrics.auc default


def _thresholds(num: int = NUM_THRESHOLDS) -> np.ndarray:
    # tf.metrics.auc: [ -eps, 1/(n-1), 2/(n-1), ..., (n-2)/(n-1), 1+eps ]
    eps = 1e-7
    inner = [(i + 1) / (num - 1) for i in range(num - 2)]
    return np.asarray([-eps] + inner + [1.0 + eps], np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AUCState:
    """Per-threshold confusion counts (each shape (NUM_THRESHOLDS,))."""

    tp: jax.Array
    fp: jax.Array
    tn: jax.Array
    fn: jax.Array

    @classmethod
    def init(cls) -> "AUCState":
        # four distinct buffers (a shared one breaks jit donation)
        z = lambda: jnp.zeros((NUM_THRESHOLDS,), jnp.float32)
        return cls(tp=z(), fp=z(), tn=z(), fn=z())


def auc_update(
    state: AUCState,
    labels: jax.Array,       # (B,) in {0, 1}
    predictions: jax.Array,  # (B,) probabilities in [0, 1]
    weights: jax.Array | None = None,  # (B,) 0/1 mask for padded eval tails
) -> AUCState:
    thr = jnp.asarray(_thresholds())
    labels = labels.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones_like(labels)
    weights = weights.astype(jnp.float32)
    pred_pos = (predictions[None, :] > thr[:, None]).astype(jnp.float32)  # (T, B)
    pos = (labels * weights)[None, :]
    neg = ((1.0 - labels) * weights)[None, :]
    return AUCState(
        tp=state.tp + jnp.sum(pred_pos * pos, axis=1),
        fp=state.fp + jnp.sum(pred_pos * neg, axis=1),
        fn=state.fn + jnp.sum((1.0 - pred_pos) * pos, axis=1),
        tn=state.tn + jnp.sum((1.0 - pred_pos) * neg, axis=1),
    )


def auc_compute(state: AUCState) -> jax.Array:
    """Trapezoidal ROC-AUC over the binned counts (tf 'trapezoidal' mode)."""
    eps = 1e-7
    tpr = state.tp / jnp.maximum(state.tp + state.fn, eps)
    fpr = state.fp / jnp.maximum(state.fp + state.tn, eps)
    # thresholds ascend -> (fpr, tpr) descend; integrate |dx| * mean(y)
    return jnp.sum(
        (fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0
    )


def exact_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based AUC (ties get average rank); host-side, for final eval."""
    labels = np.asarray(labels).astype(np.float64).ravel()
    scores = np.asarray(scores).astype(np.float64).ravel()
    n_pos = labels.sum()
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_scores = scores[order]
    # average ranks over ties
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    pos_rank_sum = ranks[labels == 1].sum()
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def grouped_auc(
    labels: np.ndarray, scores: np.ndarray, groups: np.ndarray
) -> float:
    """GAUC: impression-weighted mean of per-group (per-user) AUCs.

    The DIN paper's evaluation metric (Zhou et al., KDD'18 §6.1): ranking
    quality *within* each user's impressions, weighted by the user's
    impression count; single-class groups (all-positive / all-negative)
    carry no ranking information and are excluded from both numerator and
    weight mass — the standard GAUC convention.  Host-side, final-eval
    companion to `exact_auc` (the reference reports only global AUC).
    """
    labels = np.asarray(labels).astype(np.float64).ravel()
    scores = np.asarray(scores).astype(np.float64).ravel()
    groups = np.asarray(groups).ravel()
    order = np.argsort(groups, kind="mergesort")
    labels, scores, groups = labels[order], scores[order], groups[order]
    starts = np.flatnonzero(np.r_[True, groups[1:] != groups[:-1]])
    bounds = np.r_[starts, len(groups)]
    total_w = 0.0
    total = 0.0
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        y = labels[lo:hi]
        n_pos = y.sum()
        if n_pos == 0 or n_pos == len(y):
            continue
        total += (hi - lo) * exact_auc(y, scores[lo:hi])
        total_w += hi - lo
    return float(total / total_w) if total_w else float("nan")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ScalarMeanState:
    """Streaming weighted mean (loss, accuracy)."""

    total: jax.Array
    count: jax.Array

    @classmethod
    def init(cls) -> "ScalarMeanState":
        return cls(total=jnp.zeros((), jnp.float32), count=jnp.zeros((), jnp.float32))


def mean_update(
    state: ScalarMeanState, values: jax.Array, weights: jax.Array | None = None
) -> ScalarMeanState:
    if weights is None:
        weights = jnp.ones_like(values)
    return ScalarMeanState(
        total=state.total + jnp.sum(values * weights),
        count=state.count + jnp.sum(weights),
    )


def mean_compute(state: ScalarMeanState) -> jax.Array:
    return state.total / jnp.maximum(state.count, 1e-7)
