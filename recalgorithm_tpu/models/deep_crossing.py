"""DeepCrossing: stacked residual units over the concatenated feature vector.

Reference: algorithm/DeepCrossing/deepcrossing.py (model_fn L121-270,
residual stack L152-159) — dense(16) + W&D-family embeddings (incl. the
mean-pooled behaviour sequence sharing the feedid table) concatenated, run
through ``residual_network_num`` ResidualUnits, then a 1-unit logit head.
Strongest documented single-task baseline: read_comment AUC 0.9185908
(README.md:21).
"""

from __future__ import annotations

import dataclasses

import jax
import flax.linen as nn
import jax.numpy as jnp

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.mlp import Dense, ResidualUnit


@dataclasses.dataclass(frozen=True)
class DeepCrossingConfig(common.TrainFlags):
    residual_internal_dim: int = 128
    residual_network_num: int = 1
    task_names: tuple[str, ...] = ("read_comment",)


class DeepCrossing(nn.Module):
    config: DeepCrossingConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema),
            fields=[
                ("userid", "userid", "scalar"),
                ("device", "device", "scalar"),
                ("authorid", "authorid", "scalar"),
                ("bgm_song_id", "bgm_song_id", "scalar"),
                ("bgm_singer_id", "bgm_singer_id", "scalar"),
                ("manual_tag_list", "manual_tag_id", "mean"),
                ("feedid", "feedid", "scalar"),
                ("his_read_comment_7d_seq", "feedid", "mean"),
            ],
        )
        x = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        for i in range(self.config.residual_network_num):
            x = ResidualUnit(
                self.config.residual_internal_dim,
                compute_dtype=self.config.compute_dtype,
                name=f"res_{i}",
            )(x)
        logit = Dense(1, name="logit")(x)[:, 0]
        return {"read_comment": logit}


common.register_model("DeepCrossing", DeepCrossingConfig, DeepCrossing)
