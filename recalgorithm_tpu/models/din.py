"""DIN: Deep Interest Network — target attention over the behaviour sequence.

Reference: algorithm/DIN/din.py — dense + 6 W&D-dim category fields
(L85-111); target feedid and the behaviour sequence share the 16-dim feedid
table (L112-114); din_attention pooling (L217-218, din_attention.py); MLP
with dense(no act) -> dice/prelu -> BN -> dropout ordering (L224-238);
"mini-batch-aware" regularisation approximated as
l2_lambda * ||concat(category, target, attention)||^2/2 / B (L253-257),
sowed into the 'losses' collection.
Baseline: read_comment AUC 0.9116896 (README.md:29).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.activations import Dice, PReLU
from recalgorithm_tpu.ops.attention import DINAttention, resolve_fused
from recalgorithm_tpu.ops.mlp import Dense

DIN_CATEGORY_FIELDS = [
    ("userid", "userid", "scalar"),
    ("device", "device", "scalar"),
    ("authorid", "authorid", "scalar"),
    ("bgm_song_id", "bgm_song_id", "scalar"),
    ("bgm_singer_id", "bgm_singer_id", "scalar"),
    ("manual_tag_list", "manual_tag_id", "mean"),
]


@dataclasses.dataclass(frozen=True)
class DINConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    activation: str = "dice"  # {'dice', 'prelu'}
    mini_batch_aware_regularization: bool = True
    l2_lambda: float = 0.2
    use_softmax: bool = False
    # Pallas kernel: "auto" = on for TPU backends (resolve_fused), off on
    # CPU/GPU; "true"/"false"/bool overrides
    use_fused_attention: str = "auto"
    attn_interpret: bool = False  # run the Pallas kernel interpreted (CPU debug)
    task_names: tuple[str, ...] = ("read_comment",)


class SequenceMLP(nn.Module):
    """DIN/DIEN fcn: dense(no act) -> dice/prelu -> BN -> dropout per layer."""

    hidden_units: tuple[int, ...]
    activation: str
    batch_norm: bool
    dropout_rate: float
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool) -> jax.Array:
        for i, unit in enumerate(self.hidden_units):
            x = Dense(unit, dtype=self.compute_dtype, name=f"dense_{i}")(x)
            if self.activation == "dice":
                x = Dice(name=f"dice_{i}")(x, train)
            else:
                x = PReLU(name=f"prelu_{i}")(x)
            if self.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    name=f"bn_{i}",
                )(x)
            if 0.0 < self.dropout_rate < 1.0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return Dense(1, name="logit")(x)[:, 0]


class DIN(nn.Module):
    config: DINConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=DIN_CATEGORY_FIELDS
        )
        category = jnp.concatenate(embedder(batch), axis=-1)
        target = embedder.embed.embed_scalar("feedid", batch["feedid"])  # (B, 16)
        seq = embedder.embed.embed_sequence(
            "feedid", batch["his_read_comment_7d_seq"]
        )  # (B, T, 16)
        lengths = batch["his_read_comment_7d_seq_len"]
        attention = DINAttention(
            use_softmax=cfg.use_softmax,
            fused=resolve_fused(cfg.use_fused_attention),
            interpret=cfg.attn_interpret,
            name="attention",
        )(target, seq, lengths)
        x = jnp.concatenate([batch["dense"], category, target, attention], axis=-1)
        logit = SequenceMLP(
            cfg.hidden_units, cfg.activation, cfg.batch_norm, cfg.dropout_rate,
            compute_dtype=cfg.compute_dtype, name="fcn",
        )(x, train)

        if cfg.mini_batch_aware_regularization and cfg.l2_lambda > 0:
            emb = jnp.concatenate([category, target, attention], axis=-1)
            # tf.nn.l2_loss = sum(x^2)/2 (din.py:255-256)
            l2 = cfg.l2_lambda * 0.5 * jnp.sum(jnp.square(emb)) / emb.shape[0]
            self.sow("losses", "mba_l2", l2)

        return {"read_comment": logit}


common.register_model("DIN", DINConfig, DIN)
