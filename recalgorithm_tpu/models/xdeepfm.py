"""xDeepFM: linear + CIN + plain DNN, three summed logits.

Reference: algorithm/xDeepFM/xdeepfm.py — 8 uniform-dim embedding fields
(L102-112); linear logit over concat(dense, flat embeddings) (L161-163); CIN
stack with per-layer feature-map counts, sum-pool over K, concat ->
bias-free Dense(1) (L166-175, cin_layer.py:4-30); plain relu DNN (no BN/
dropout, L178-182) -> bias-free Dense(1); total = sum of three (L185).
Baseline: read_comment AUC 0.9152467 (README.md:27).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.pnn import PNN_FIELDS, PNN_VOCABS
from recalgorithm_tpu.ops.interactions import CINLayer
from recalgorithm_tpu.ops.mlp import Dense


@dataclasses.dataclass(frozen=True)
class XDeepFMConfig(common.TrainFlags):
    embedding_dim: int = 8
    hidden_units: tuple[int, ...] = (512, 256, 128)
    cin_layer_feature_maps: tuple[int, ...] = (50, 50, 50)
    task_names: tuple[str, ...] = ("read_comment",)


class XDeepFM(nn.Module):
    config: XDeepFMConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(self.schema, cfg.embedding_dim, PNN_VOCABS),
            fields=PNN_FIELDS,
        )
        fields = embedder(batch)
        linear_vec = jnp.concatenate([batch["dense"]] + fields, axis=-1)
        linear_logit = Dense(1, name="linear")(linear_vec)[:, 0]

        x0 = common.stack_fields(fields)  # (B, m, D)
        xk = x0
        pooled = []
        for i, h in enumerate(cfg.cin_layer_feature_maps):
            xk = CINLayer(h, name=f"cin_{i}")(x0, xk)
            pooled.append(jnp.sum(xk, axis=-1))  # (B, h_i)
        cin_logit = Dense(1, use_bias=False, name="cin_logit")(
            jnp.concatenate(pooled, axis=-1)
        )[:, 0]

        net = linear_vec
        for i, unit in enumerate(cfg.hidden_units):
            net = nn.relu(Dense(unit, dtype=cfg.compute_dtype, name=f"dnn_{i}")(net))
        dnn_logit = Dense(1, use_bias=False, name="dnn_logit")(net)[:, 0]

        return {"read_comment": linear_logit + cin_logit + dnn_logit}


common.register_model("xDeepFM", XDeepFMConfig, XDeepFM)
