"""DCN: Deep & Cross Network (v1).

Reference: algorithm/DCN/dcn.py — input = concat(dense, W&D-family
embeddings) (L150-155); parallel cross stack with x0 fixed (L157-160,
cross_layer.py:4-26) and MLP (L162-165); concat(cross_out, deep_out) ->
Dense(1) (L167-169).  Baseline: read_comment AUC 0.9183242 (README.md:25).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.interactions import CrossNetwork
from recalgorithm_tpu.ops.mlp import Dense, MLPTower

WD_FIELDS = [
    ("userid", "userid", "scalar"),
    ("device", "device", "scalar"),
    ("authorid", "authorid", "scalar"),
    ("bgm_song_id", "bgm_song_id", "scalar"),
    ("bgm_singer_id", "bgm_singer_id", "scalar"),
    ("manual_tag_list", "manual_tag_id", "mean"),
    ("feedid", "feedid", "scalar"),
    ("his_read_comment_7d_seq", "feedid", "mean"),
]


@dataclasses.dataclass(frozen=True)
class DCNConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)
    num_cross_layer: int = 1
    batch_norm: bool = True
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment",)


class DCN(nn.Module):
    config: DCNConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=WD_FIELDS
        )
        x0 = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        cross_out = CrossNetwork(cfg.num_cross_layer, name="cross")(x0)
        deep_out = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
            name="deep",
        )(x0, train)
        logit = Dense(1, name="logit")(
            jnp.concatenate([cross_out, deep_out], axis=-1)
        )[:, 0]
        return {"read_comment": logit}


common.register_model("DCN", DCNConfig, DCN)
