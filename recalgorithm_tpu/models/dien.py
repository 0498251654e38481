"""DIEN: Deep Interest Evolution Network — GRU extraction + AGRU/AUGRU evolution.

Reference: algorithm/DIEN/dien.py — interest extraction GRU over the
behaviour sequence (L202-204); attention scores from a target-projected
bilinear form softmax'd over valid positions (L206-218); interest evolution
via AGRU/AUGRU fed per-step attention (L220-229, custom_grucell.py + the
1,454-line forked rnn.py — replaced here by `lax.scan` in ops/recurrent.py);
concat(dense, category, target, final_state) -> dice/prelu MLP (L239-255);
LazyAdam optimizer (L328-329, available as optimizer='lazyadam').

The reference version is marked broken at runtime and was never evaluated
(dien.py:200-201, README.md:35); this implementation is the working static
graph.  The flag-gated auxiliary loss (L261-300) is implemented with
in-model sampled negatives (the dataset has no negative-sample sequence
feature) and a corrected sign — the reference adds the log-likelihood
instead of subtracting it, and that code path never ran.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.din import DIN_CATEGORY_FIELDS, SequenceMLP
from recalgorithm_tpu.ops.attention import NEG_INF, sequence_mask
from recalgorithm_tpu.ops.mlp import glorot_uniform
from recalgorithm_tpu.ops.recurrent import GRULoop


@dataclasses.dataclass(frozen=True)
class DIENConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    activation: str = "dice"
    custom_gru_type: str = "AGRU"  # {'AGRU', 'AUGRU'}
    gru_output_units: int = 8
    use_auxiliary_loss: bool = False
    negative_sample_number: int = 3
    optimizer: str = "lazyadam"  # dien.py:328 LazyAdamOptimizer
    task_names: tuple[str, ...] = ("read_comment",)


class DIEN(nn.Module):
    config: DIENConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=DIN_CATEGORY_FIELDS
        )
        category = jnp.concatenate(embedder(batch), axis=-1)
        target = embedder.embed.embed_scalar("feedid", batch["feedid"])  # (B, na)
        seq = embedder.embed.embed_sequence(
            "feedid", batch["his_read_comment_7d_seq"]
        )  # (B, T, na)
        lengths = batch["his_read_comment_7d_seq_len"]
        t = seq.shape[1]
        nh = cfg.gru_output_units
        na = seq.shape[-1]

        # interest extraction
        h, _ = GRULoop(num_units=nh, cell_type="GRU", name="gru")(seq, lengths)

        # attention: h @ (W e_target), masked softmax over time (dien.py:206-218)
        w = self.param("attention_project_matrix", glorot_uniform, (nh, na))
        w_ea = jnp.einsum("ha,ba->bh", w, target)  # (B, nh)
        scores = jnp.einsum("bth,bh->bt", h, w_ea)  # (B, T)
        mask = sequence_mask(lengths, t)
        scores = jnp.where(mask, scores, NEG_INF)
        att = jax.nn.softmax(scores, axis=1)  # (B, T)

        # interest evolution
        _, final_state = GRULoop(
            num_units=nh, cell_type=cfg.custom_gru_type, name="evolution"
        )(h, lengths, att)

        x = jnp.concatenate(
            [batch["dense"], category, target, final_state], axis=-1
        )
        logit = SequenceMLP(
            cfg.hidden_units, cfg.activation, cfg.batch_norm, cfg.dropout_rate,
            compute_dtype=cfg.compute_dtype, name="fcn",
        )(x, train)

        if cfg.use_auxiliary_loss and train:
            self.sow(
                "losses", "aux",
                self._auxiliary_loss(embedder, h, seq, batch, lengths, nh, na),
            )
        return {"read_comment": logit}

    def _auxiliary_loss(self, embedder, h, seq, batch, lengths, nh, na):
        """Next-item discrimination: h_t should score e_{t+1} above negatives.

        Follows dien.py:261-300 structurally (shared (na, nh) projection,
        log-sigmoid positives, log(1-sigmoid) negatives, masked to valid
        steps) with two deliberate fixes: the loss is *negated* (the
        reference maximises itself into the objective — dead code, never
        ran) and negatives are sampled in-model by rolling the behaviour
        sequence across the batch instead of a dataset feature that does
        not exist.
        """
        cfg = self.config
        w_aux = self.param("aux_project_matrix", glorot_uniform, (na, nh))
        pos = seq[:, 1:, :] @ w_aux  # (B, T-1, nh)
        h_ = h[:, :-1, :]  # (B, T-1, nh)
        eps = 1e-8
        pos_ll = jnp.log(jax.nn.sigmoid(jnp.sum(h_ * pos, -1)) + eps)  # (B, T-1)
        neg_ll = 0.0
        for k in range(1, cfg.negative_sample_number + 1):
            neg_seq = jnp.roll(seq, k, axis=0)[:, 1:, :] @ w_aux
            neg_ll = neg_ll + jnp.log(
                1.0 - jax.nn.sigmoid(jnp.sum(h_ * neg_seq, -1)) + eps
            )
        m = sequence_mask(lengths - 1, seq.shape[1] - 1).astype(jnp.float32)
        ll = jnp.sum((pos_ll + neg_ll) * m, axis=1)  # (B,)
        return -jnp.mean(ll)


common.register_model("DIEN", DIENConfig, DIEN)
