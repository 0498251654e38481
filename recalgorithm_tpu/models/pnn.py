"""PNN: product-based neural network (IPNN / OPNN).

Reference: algorithm/PNN/pnn.py — 8 uniform-dim embedding fields incl. the
mean-pooled behaviour sequence sharing the feedid table (L75-85); linear
signal lz = flat embeddings x W (L133-139); product signal lp = IPNN
(per-unit ||sum_f theta_f v_f||^2, L146-158) or OPNN (sum-pooled outer
product contracted with symmetrised W_i, L160-173); relu(lz + lp + b) -> MLP
-> Dense(1) (L178-193); optional L2 penalty on the linear/product weights
via REGULARIZATION_LOSSES (L209-211) — sowed into the 'losses' collection.
Baseline: read_comment AUC 0.9065931 (README.md:22).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.interactions import InnerProductLayer, OuterProductLayer
from recalgorithm_tpu.ops.mlp import MLPTower, glorot_uniform

PNN_FIELDS = [(n, n, "scalar") for n in common.SCALAR_CAT_FIELDS] + [
    ("manual_tag_list", "manual_tag_id", "mean"),
    ("his_read_comment_7d_seq", "feedid", "mean"),
]
PNN_VOCABS = tuple(common.SCALAR_CAT_FIELDS) + ("manual_tag_id",)


@dataclasses.dataclass(frozen=True)
class PNNConfig(common.TrainFlags):
    embedding_dim: int = 8
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    output_dimension: int = 1024
    product_method: str = "IPNN"
    weight_regularizer: float = 0.0
    task_names: tuple[str, ...] = ("read_comment",)


class PNN(nn.Module):
    config: PNNConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(self.schema, cfg.embedding_dim, PNN_VOCABS),
            fields=PNN_FIELDS,
        )
        fields = embedder(batch)
        flat = jnp.concatenate(fields, axis=-1)  # (B, F*K)
        field_emb = common.stack_fields(fields)  # (B, F, K)

        linear_w = self.param(
            "linear_w", glorot_uniform, (flat.shape[-1], cfg.output_dimension)
        )
        lz = flat @ linear_w  # (B, D)

        if cfg.product_method == "IPNN":
            lp = InnerProductLayer(
                cfg.output_dimension,
                weight_regularizer=cfg.weight_regularizer,
                name="inner_product",
            )(field_emb)
        else:
            lp = OuterProductLayer(
                cfg.output_dimension,
                weight_regularizer=cfg.weight_regularizer,
                name="outer_product",
            )(field_emb)

        bias = self.param("bias", nn.initializers.zeros, (cfg.output_dimension,))
        x = nn.relu(lz + lp + bias)
        logit = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            logits_dim=1,
            compute_dtype=cfg.compute_dtype,
            name="fcn",
        )(x, train)[:, 0]

        if cfg.weight_regularizer > 0:
            # tf.contrib.layers.l2_regularizer(scale) = scale * sum(w^2) / 2
            reg = 0.5 * cfg.weight_regularizer * jnp.sum(jnp.square(linear_w))
            self.sow("losses", "weight_l2", reg)

        return {"read_comment": logit}


common.register_model("PNN", PNNConfig, PNN)
