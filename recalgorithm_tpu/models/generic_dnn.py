"""GenericDNN: a schema-driven DNN baseline that trains on ANY dataset.

Every other zoo entry hard-codes the WeChat field list (reference parity —
each reference script hand-writes its create_feature_columns()).  This model
derives its fields from the Schema instead: every categorical feature embeds
as a scalar field, every sequence feature mean-pools into the same-dim field
(sharing its vocabulary's table), and the dense block concatenates in front
— so the SAME model trains on the WeChat schema, the Douban schema
(features/schema.douban_schema — the dataset whose reference ETL was
abandoned upstream and completed in data/douban.py), or any future one.
Tasks default to the schema's first label and are overridable with
--task_names.

Architecture: concat(dense, embeddings) -> BN -> MLP -> Dense(1) per task —
the DeepCrossing/W&D deep-tower shape without the model-specific extras.
"""

from __future__ import annotations

import dataclasses

import jax
import flax.linen as nn
import jax.numpy as jnp

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.mlp import Dense, MLPTower


@dataclasses.dataclass(frozen=True)
class GenericDNNConfig(common.TrainFlags):
    embedding_dim: int = 16
    hidden_units: tuple[int, ...] = (256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    # () = the schema's first label (resolved at apply time); the trainer
    # reads task_names through the model's `task_names` property
    task_names: tuple[str, ...] = ()


class GenericDNN(nn.Module):
    config: GenericDNNConfig
    schema: Schema

    @property
    def tasks(self) -> tuple[str, ...]:
        return self.config.task_names or (self.schema.labels[0],)

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        s = self.schema
        vocabs = sorted(
            {f.vocab for f in s.categorical} | {f.vocab for f in s.sequence}
        )
        fields = [(f.name, f.vocab, "scalar") for f in s.categorical]
        fields += [(f.name, f.vocab, "mean") for f in s.sequence]
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(s, cfg.embedding_dim, vocabs),
            fields=fields,
        )
        parts = [batch["dense"]] + embedder(batch)
        x = jnp.concatenate(parts, axis=-1)
        x = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
            name="deep",
        )(x, train)
        return {
            t: Dense(1, name=f"logit_{t}")(x)[:, 0] for t in self.tasks
        }


common.register_model("GenericDNN", GenericDNNConfig, GenericDNN)
