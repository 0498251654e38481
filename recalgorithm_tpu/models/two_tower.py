"""TwoTower: dual-encoder retrieval model with in-batch sampled softmax
(beyond-reference addition — a new model FAMILY, not another ranker).

No reference counterpart — the reference zoo is pure CTR ranking; this is
the candidate-generation stage that feeds it (Covington et al. 2016,
YouTubeDNN; Yi et al. 2019 in-batch softmax).  Mapped onto the WeChat
surface:

  * user tower: userid + device embeddings, the mean-pooled 7-day
    behaviour sequence (sharing the feedid table with the item tower —
    the classic shared-id-space trick), and the ``u_*`` dense stats;
  * item tower: feedid + authorid + bgm ids + mean-pooled manual tags,
    ``videoplayseconds`` and the ``i_*`` dense stats.

Both towers end in an L2-normalised ``output_dim`` vector; the training
logit is cosine/temperature.  Losses:

  * in-batch sampled softmax over the (B, B) score matrix, positives on
    the diagonal, rows weighted by the click label (only positive pairs
    anchor a softmax), with same-feedid collisions masked to -inf so a
    duplicate item is never its own false negative — sowed into the
    'losses' collection the trainer already sums;
  * optional log-Q correction (``logq_correction=True``, Yi et al. 2019
    §3.2): in-batch negatives are sampled by item popularity, so each
    candidate's logit gets ``- log(p_item)``; ``p`` comes from a streaming
    EMA item-frequency estimator kept as a BatchNorm-style running stat in
    the ``batch_stats`` collection (checkpointed/exported for free,
    untouched at inference);
  * the standard per-task sigmoid CE on the cosine logit (calibration).
    ``task_loss_weights=(("read_comment", 0.0),)`` turns it off for pure
    retrieval training while AUC metrics keep reporting.

TPU notes: the whole model is embedding gathers + two small MLP stacks +
one (B, D) x (D, B) MXU matmul for the in-batch scores; static shapes
throughout.  Serving-side brute-force scoring lives in
``serving/retrieval.py`` (corpus matmul + ``lax.top_k``) — on TPU the
MXU makes exact exhaustive retrieval at WeChat scale (106k items) cheaper
than an approximate index.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.embed.tables import EmbeddingCollection, TableSpec
from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.mlp import MLPTower


@dataclasses.dataclass(frozen=True)
class TwoTowerConfig(common.TrainFlags):
    embedding_dim: int = 16
    hidden_units: tuple[int, ...] = (128,)  # per-tower hidden stack
    output_dim: int = 64
    temperature: float = 0.07
    softmax_weight: float = 1.0  # weight of the in-batch softmax loss
    # subtract log(p_item) from each candidate logit (sampled-softmax
    # correction for popularity-biased in-batch negatives)
    logq_correction: bool = False
    freq_decay: float = 0.99  # EMA decay of the item-frequency estimator
    batch_norm: bool = False  # towers feed a normalised dot — keep them lean
    dropout_rate: float = 0.0
    # (task, weight) pairs for the trainer's sigmoid-CE sum; 1.0 keeps the
    # calibrated-logit hybrid, 0.0 = pure in-batch-softmax training
    task_loss_weights: tuple[tuple[str, float], ...] = (("read_comment", 1.0),)
    task_names: tuple[str, ...] = ("read_comment",)


def _dense_split(schema: Schema) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Indices of user-side (u_*) and item-side (rest) dense features."""
    user, item = [], []
    for i, f in enumerate(schema.dense):
        (user if f.name.startswith("u_") else item).append(i)
    return tuple(user), tuple(item)


class TwoTower(nn.Module):
    config: TwoTowerConfig
    schema: Schema

    def setup(self):
        cfg = self.config
        vocabs = tuple(common.SCALAR_CAT_FIELDS) + ("manual_tag_id",)
        self.embed = EmbeddingCollection(tables={
            v: TableSpec(v, self.schema.vocab_sizes[v], cfg.embedding_dim)
            for v in vocabs
        })
        tower = dict(
            hidden_units=cfg.hidden_units,
            logits_dim=cfg.output_dim,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
        )
        self.user_tower = MLPTower(**tower)
        self.item_tower = MLPTower(**tower)
        self._user_dense, self._item_dense = _dense_split(self.schema)
        if cfg.logq_correction:
            self._freq = self.variable(
                "batch_stats", "feedid_freq",
                lambda: jnp.full(
                    (self.schema.vocab_sizes["feedid"],), 1.0, jnp.float32
                ),  # uniform prior
            )

    def user_embedding(self, batch, train: bool = False) -> jax.Array:
        """(B, output_dim) L2-normalised user vector."""
        x = jnp.concatenate([
            self.embed.embed_scalar("userid", batch["userid"]),
            self.embed.embed_scalar("device", batch["device"]),
            self.embed.embed_pooled(
                "feedid", batch["his_read_comment_7d_seq"], "mean"
            ),
            batch["dense"][:, self._user_dense],
        ], axis=-1)
        u = self.user_tower(x, train)
        return u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-6)

    def item_embedding(self, batch, train: bool = False) -> jax.Array:
        """(B, output_dim) L2-normalised item vector."""
        x = jnp.concatenate([
            self.embed.embed_scalar("feedid", batch["feedid"]),
            self.embed.embed_scalar("authorid", batch["authorid"]),
            self.embed.embed_scalar("bgm_song_id", batch["bgm_song_id"]),
            self.embed.embed_scalar("bgm_singer_id", batch["bgm_singer_id"]),
            self.embed.embed_pooled(
                "manual_tag_id", batch["manual_tag_list"], "mean"
            ),
            batch["dense"][:, self._item_dense],
        ], axis=-1)
        v = self.item_tower(x, train)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)

    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        u = self.user_embedding(batch, train)
        v = self.item_embedding(batch, train)
        logit = jnp.sum(u * v, axis=-1) / cfg.temperature  # (B,)

        # the sampled-softmax auxiliary loss needs labels — present in
        # training batches but absent at serving (cli/serve.py requests,
        # StableHLO export specs strip them); serving wants only the logit
        if cfg.softmax_weight > 0 and "labels" in batch:
            scores = (u @ v.T) / cfg.temperature  # (B, B)
            feed = batch["feedid"].reshape(-1)
            if cfg.logq_correction:
                scores = scores - self._log_q(feed, train)[None, :]
            # mask same-feedid off-diagonal collisions (false negatives)
            same = feed[:, None] == feed[None, :]
            eye = jnp.eye(scores.shape[0], dtype=bool)
            scores = jnp.where(same & ~eye, -1e9, scores)
            logp = jax.nn.log_softmax(scores, axis=-1)
            y = batch["labels"][:, self.schema.labels.index("read_comment")]
            y = y.astype(jnp.float32)
            # only clicked (positive) pairs anchor a softmax row
            loss = -jnp.sum(jnp.diagonal(logp) * y) / jnp.maximum(
                jnp.sum(y), 1.0
            )
            self.sow("losses", "in_batch_softmax", cfg.softmax_weight * loss)

        return {"read_comment": logit}

    def _log_q(self, feed: jax.Array, train: bool) -> jax.Array:
        """(B,) log sampling probability of each in-batch candidate item.

        Streaming EMA of per-feedid occurrence counts, stored in
        ``batch_stats`` (the running-stats collection the trainer threads,
        checkpoints and exports) and updated only when it is mutable, i.e.
        in train mode — exactly BatchNorm's contract."""
        vocab = self.schema.vocab_sizes["feedid"]
        freq = self._freq
        if train and not self.is_initializing():
            hist = jnp.zeros((vocab,), jnp.float32).at[feed].add(1.0)
            freq.value = self.config.freq_decay * freq.value + hist
        p = freq.value[feed] / jnp.sum(freq.value)
        return jnp.log(jnp.maximum(p, 1e-12))


common.register_model("TwoTower", TwoTowerConfig, TwoTower)
