"""Brute-force MXU retrieval for two-tower models (beyond-reference).

No reference counterpart — the reference serves rankers only.  On TPU the
right candidate-generation index at WeChat scale is NO index: scoring a
(B, D) user block against a (N, D) corpus is one MXU matmul
(B=512, N=106k, D=64 → ~7 GFLOP/s of trivially-tiled bf16 work), and
`lax.top_k` over the score rows is a fused on-device reduction.  Exact
exhaustive retrieval beats an approximate ANN structure until N is orders
of magnitude larger, with zero recall loss and zero host round trips.

Usage:
    retr = Retriever(model, variables)
    retr.build_corpus(item_batches)          # dedup by feedid, embed, stack
    ids, scores = retr.retrieve(user_batch, k=100)

For corpora too large to hold in f32, ``quantize_corpus=True`` stores the
corpus as per-row int8 (+f32 scales, 4x less HBM), selects candidates with
an int8 MXU matmul and rescores ``k * overfetch`` of them exactly
(`quantized_top_k`); measured recall vs exact f32 lives in
tests/test_retrieval.py.
"""

from __future__ import annotations

import math
from typing import Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def brute_force_top_k(
    user_vecs: jax.Array, corpus: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a corpus: (B, D) x (N, D) -> (B, k) scores + indices.

    One MXU matmul + `lax.top_k`; static shapes, jit-safe.  Scores are the
    raw dot products — towers emit L2-normalised vectors, so this is cosine
    similarity and monotone in the serving temperature.
    """
    scores = user_vecs @ corpus.T  # (B, N)
    return jax.lax.top_k(scores, k)


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 (jnp twin of serving/quantize.quantize_table)."""
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantized_top_k(
    user_vecs: jax.Array,
    corpus_q: jax.Array,      # (N, D) int8
    corpus_scale: jax.Array,  # (N, 1) f32
    k: int,
    overfetch: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over an int8 corpus: coarse int8 MXU scoring + exact rescore.

    For corpora too large to keep in f32, the corpus lives as per-row int8
    (4x less HBM).  Candidate selection runs the (B, N) matmul entirely in
    int8 — the MXU's native low-precision path, 4x less corpus bandwidth —
    then the top ``k * overfetch`` candidates per user are rescored as
    f32-user x dequantized-candidate rows (removing the user-side
    quantization error; the residual corpus-side error is bounded by
    scale/2 per dimension).  Recall vs exact f32 is measured in
    tests/test_retrieval.py.

    The user-side scale is a positive per-row scalar, so it cannot change
    each user's candidate ranking and is skipped.
    """
    n = corpus_q.shape[0]
    k = min(k, n)
    m = min(k * overfetch, n)
    uq, _ = _quantize_rows(user_vecs)
    coarse = jnp.matmul(
        uq, corpus_q.T, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * corpus_scale[:, 0][None, :]  # (B, N)
    _, cand = jax.lax.top_k(coarse, m)  # (B, m) corpus rows
    cq = jnp.take(corpus_q, cand.reshape(-1), axis=0)
    cs = jnp.take(corpus_scale, cand.reshape(-1), axis=0)
    cvecs = (cq.astype(jnp.float32) * cs).reshape(*cand.shape, -1)  # (B, m, D)
    rescore = jnp.einsum("bd,bmd->bm", user_vecs, cvecs)
    scores, pos = jax.lax.top_k(rescore, k)
    return scores, jnp.take_along_axis(cand, pos, axis=1)


def sharded_top_k(
    user_vecs: jax.Array, corpus: jax.Array, k: int, mesh: Mesh
) -> tuple[jax.Array, jax.Array]:
    """Exact distributed top-k: corpus rows sharded over ALL mesh axes.

    The multi-chip scaling path for retrieval (same layout rule as the
    row-sharded embedding tables, `parallel/mesh.py` TABLE_SPEC): each
    device scores the replicated user block against its corpus shard
    (local MXU matmul, HBM traffic divided by device count), takes a local
    top-k, and one small `(B, n_dev*k)` all-gather feeds the global merge —
    candidates ride ICI, never the (B, N) score matrix.  Exact because
    every global winner is a local winner on its own shard.

    Returns replicated ``(scores, global_row_indices)``, both (B, k);
    padding rows score -inf and can never win.  k is capped per-shard at
    the shard size, which preserves exactness (a shard cannot contribute
    more rows than it holds).
    """
    axes = tuple(mesh.axis_names)
    n_dev = math.prod(mesh.shape.values())
    n = corpus.shape[0]
    k = min(k, n)  # cannot return more rows than the corpus holds
    pad = (-n) % n_dev
    corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    n_loc = corpus.shape[0] // n_dev
    k_loc = min(k, n_loc)

    def local(u, c):
        flat = jnp.zeros((), jnp.int32)
        for name in axes:
            flat = flat * mesh.shape[name] + jax.lax.axis_index(name)
        base = flat * n_loc
        scores = u @ c.T  # (B, n_loc) on this shard's rows
        gid = base + jnp.arange(n_loc)
        scores = jnp.where(gid[None, :] < n, scores, -jnp.inf)
        s, i = jax.lax.top_k(scores, k_loc)
        cand_s = jax.lax.all_gather(s, axes, axis=1, tiled=True)
        cand_i = jax.lax.all_gather(base + i, axes, axis=1, tiled=True)
        out_s, pos = jax.lax.top_k(cand_s, k)  # (B, min(k, n_dev*k_loc))
        return out_s, jnp.take_along_axis(cand_i, pos, axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axes, None)),
        out_specs=(P(), P()),
        # the merge inputs are all_gathered (identical on every device) but
        # vma can't statically prove that; serving-only path, no autodiff
        check_vma=False,
    )
    return fn(user_vecs, corpus)


class Retriever:
    """Embeds a corpus with the item tower and serves exact top-k users.

    ``variables`` is the dict the train loop exports ({'params': ...,
    'batch_stats': ...}); ``model`` is a module exposing ``user_embedding``
    / ``item_embedding`` methods (TwoTower).  With a ``mesh``, scoring runs
    the distributed `sharded_top_k` (corpus rows sharded over all axes).
    """

    def __init__(
        self,
        model,
        variables: Mapping,
        mesh: Mesh | None = None,
        serve_k: int = 100,
        quantize_corpus: bool = False,
        overfetch: int = 4,
    ):
        """quantize_corpus: store the corpus as per-row int8 (+f32 scales)
        and retrieve via `quantized_top_k` — 4x less corpus HBM, int8 MXU
        coarse scoring, exact-user rescore of k*overfetch candidates.
        Single-chip path only (the sharded corpus already divides HBM by
        the device count)."""
        if quantize_corpus and mesh is not None:
            raise ValueError("quantize_corpus and mesh are mutually exclusive")
        self.serve_k = serve_k
        self.quantize_corpus = quantize_corpus
        self.overfetch = overfetch
        self.corpus_q = None      # (N, D) int8 when quantize_corpus
        self.corpus_scale = None  # (N, 1) f32 when quantize_corpus
        self.model = model
        self.variables = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        self.corpus: jax.Array | None = None  # (N, D)
        self.corpus_ids: np.ndarray | None = None  # (N,) feedids
        self._embed_items = jax.jit(
            lambda b: self.model.apply(
                self.variables, b, train=False,
                method=self.model.item_embedding,
            )
        )
        self._embed_users = jax.jit(
            lambda b: self.model.apply(
                self.variables, b, train=False,
                method=self.model.user_embedding,
            )
        )
        if quantize_corpus:
            self._topk_q = jax.jit(
                lambda u, q, s, k: quantized_top_k(u, q, s, k, overfetch),
                static_argnums=3,
            )
            self._topk = None
        elif mesh is None:
            self._topk = jax.jit(brute_force_top_k, static_argnums=2)
        else:
            self._topk = jax.jit(
                lambda u, c, k: sharded_top_k(u, c, k, mesh),
                static_argnums=2,
            )

    def build_corpus(self, item_batches: Iterable[Mapping]) -> int:
        """Embed item batches, dedup by feedid (first occurrence wins).

        Batches are standard translated training batches; only the item-side
        columns are read.  Returns the corpus size N.
        """
        seen: set[int] = set()
        ids_out: list[np.ndarray] = []
        vec_out: list[np.ndarray] = []
        for batch in item_batches:
            feed = np.asarray(batch["feedid"]).reshape(-1)
            vecs = np.asarray(self._embed_items(batch))
            # first occurrence within the batch AND unseen across batches;
            # id 0 is PAD/OOV (padded eval tails, stale-vocab items) — a
            # real corpus must never contain it, and recall against it
            # would count every OOV positive as a hit
            _, first = np.unique(feed, return_index=True)
            fresh = np.zeros(feed.shape[0], dtype=bool)
            fresh[first] = True
            fresh &= feed > 0
            fresh &= np.array([f not in seen for f in feed])
            if fresh.any():
                seen.update(feed[fresh].tolist())
                ids_out.append(feed[fresh])
                vec_out.append(vecs[fresh])
        if not ids_out:
            raise ValueError("build_corpus: no items")
        self.corpus_ids = np.concatenate(ids_out)
        vecs = np.concatenate(vec_out)
        if self.quantize_corpus:
            from recalgorithm_tpu.serving.quantize import quantize_table

            q, scale = quantize_table(vecs)
            self.corpus_q = jnp.asarray(q)
            self.corpus_scale = jnp.asarray(scale)
            self.corpus = None  # f32 never kept — that's the point
            return int(self.corpus_q.shape[0])
        self.corpus = jnp.asarray(vecs)
        return int(self.corpus.shape[0])

    @staticmethod
    def _snapshot_path(path: str) -> str:
        # np.savez APPENDS .npz to suffix-less paths; normalise on both
        # sides so save('x') / load('x') round-trips
        return path if path.endswith(".npz") else path + ".npz"

    def save_corpus(self, path: str) -> str:
        """Publish the built index as one .npz snapshot (ids + vectors —
        int8+scales when quantized, f32 otherwise).  The production shape:
        the corpus is built offline/periodically and shipped to serving
        replicas, which load it without re-embedding.  Returns the actual
        file path written (.npz appended when missing)."""
        if self.corpus is None and self.corpus_q is None:
            raise ValueError("call build_corpus first")
        arrays = {"corpus_ids": self.corpus_ids}
        if self.quantize_corpus:
            arrays["corpus_q"] = np.asarray(self.corpus_q)
            arrays["corpus_scale"] = np.asarray(self.corpus_scale)
        else:
            arrays["corpus"] = np.asarray(self.corpus)
        path = self._snapshot_path(path)
        np.savez(path, **arrays)
        return path

    def load_corpus(self, path: str) -> int:
        """Load a save_corpus snapshot; returns N.  The snapshot's
        quantization must match this Retriever's ``quantize_corpus``."""
        with np.load(self._snapshot_path(path)) as z:
            if self.quantize_corpus:
                if "corpus_q" not in z:
                    raise ValueError("snapshot is f32 but quantize_corpus=True")
                self.corpus_q = jnp.asarray(z["corpus_q"])
                self.corpus_scale = jnp.asarray(z["corpus_scale"])
                n = int(self.corpus_q.shape[0])
            else:
                if "corpus" not in z:
                    raise ValueError("snapshot is int8 but quantize_corpus=False")
                self.corpus = jnp.asarray(z["corpus"])
                n = int(self.corpus.shape[0])
            self.corpus_ids = z["corpus_ids"]
        return n

    def retrieve(
        self, user_batch: Mapping, k: int = 100
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k feedids + cosine scores for each user row: (B, k), (B, k)."""
        if self.corpus is None and self.corpus_q is None:
            raise ValueError("call build_corpus first")
        u = self._embed_users(user_batch)
        if self.quantize_corpus:
            scores, idx = self._topk_q(u, self.corpus_q, self.corpus_scale, k)
        else:
            scores, idx = self._topk(u, self.corpus, k)
        return self.corpus_ids[np.asarray(idx)], np.asarray(scores)

    def predict_batch(self, batch: Mapping) -> dict[str, np.ndarray]:
        """Batch interface for `serving.server.BatchingPredictor`: returns
        {'feedids': (B, serve_k), 'scores': (B, serve_k)} so single-user
        retrieval requests co-batch through the same dynamic batcher as
        ranking traffic.  Padded tail rows (the batcher's zero rows) produce
        rows that the batcher slices away per-request."""
        ids, scores = self.retrieve(batch, self.serve_k)
        return {"feedids": ids, "scores": scores}

    def recall_at_k(
        self, batches: Iterable[Mapping], k: int, label_index: int = 0
    ) -> float:
        """Offline Recall@K: over positive rows (labels[:, label_index] > 0),
        the fraction whose own feedid lands in the user's top-k.

        The random-tower baseline is ~k/N; a trained model must clear it.
        """
        hits, total = 0, 0
        for batch in batches:
            y = np.asarray(batch["labels"])[:, label_index] > 0
            # padded tails (_weights 0) and OOV target items (feedid 0)
            # carry no retrievable ground truth
            w = batch.get("_weights")
            if w is not None:
                y &= np.asarray(w) > 0
            y &= np.asarray(batch["feedid"]).reshape(-1) > 0
            if not y.any():
                continue
            ids, _ = self.retrieve(batch, k)
            feed = np.asarray(batch["feedid"]).reshape(-1)
            hits += int(np.sum((ids[y] == feed[y, None]).any(axis=1)))
            total += int(y.sum())
        return hits / max(total, 1)
