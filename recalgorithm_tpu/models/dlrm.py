"""DLRM: deep learning recommendation model (beyond-reference addition).

No reference counterpart — this is Naumov et al. 2019 (arXiv:1906.00091),
the MLPerf recommender benchmark architecture, mapped onto the WeChat
feature surface: dense features run a bottom MLP down to the embedding
dim and join the categorical fields as one more latent vector; the
interaction is all pairwise dots between the F+1 vectors (reusing
``pairwise_dot``'s Gram-matrix MXU kernel from FwFM); the top MLP
consumes concat(bottom output, pairwise dots).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.pnn import PNN_FIELDS, PNN_VOCABS
from recalgorithm_tpu.ops.interactions import pairwise_dot
from recalgorithm_tpu.ops.mlp import Dense, MLPTower


@dataclasses.dataclass(frozen=True)
class DLRMConfig(common.TrainFlags):
    embedding_dim: int = 16
    bottom_hidden_units: tuple[int, ...] = (64,)
    hidden_units: tuple[int, ...] = (256, 128)  # top MLP
    batch_norm: bool = True
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment",)


class DLRM(nn.Module):
    config: DLRMConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        bottom = MLPTower(
            hidden_units=cfg.bottom_hidden_units,
            dropout_rate=0.0,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
            name="bottom",
        )(batch["dense"], train)
        bottom = Dense(cfg.embedding_dim, name="bottom_out")(bottom)  # (B, K)
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(
                self.schema, cfg.embedding_dim, PNN_VOCABS
            ),
            fields=PNN_FIELDS,
        )
        z = common.stack_fields([bottom] + embedder(batch))  # (B, F+1, K)
        ints = pairwise_dot(z)  # (B, (F+1)F/2)
        top = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
            name="top",
        )(jnp.concatenate([bottom, ints], axis=-1), train)
        return {"read_comment": Dense(1, name="logit")(top)[:, 0]}


common.register_model("DLRM", DLRMConfig, DLRM)
