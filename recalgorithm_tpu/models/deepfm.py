"""DeepFM: FM first+second order plus a deep tower over shared embeddings.

Reference: algorithm/DeepFM/deepfm.py — 6 scalar categorical fields only
(L56-95); first order = one-hot indicators -> Dense(1) (L179-181, here a
sparse per-id weight sum); second order = sum-square FM pooling summed over K
(L192-200); deep = MLP(relu -> dropout -> BN) over concatenated field
embeddings (L203-212); logit = first + second + deep (L214).
Baseline: read_comment AUC 0.8529998 (README.md:24).

Schema-driven (round 5): on the WeChat schema the field list is the
reference's exact 6 scalar fields (parity, golden bands unchanged); on any
other schema (douban, ...) fields derive from the Schema itself —
categoricals as scalar fields, sequences mean-pooled into the FM field list
and sum-pooled into the first-order term (the multi-hot FM generalisation).
The task defaults to the schema's first label (read_comment on WeChat).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.interactions import fm_pool
from recalgorithm_tpu.ops.mlp import MLPTower

SCALAR_FIELDS = [(n, n, "scalar") for n in common.SCALAR_CAT_FIELDS]


@dataclasses.dataclass(frozen=True)
class DeepFMConfig(common.TrainFlags):
    # measured: the 64MB scoped-VMEM budget hurts this pure-FM
    # model's fusion choices (no sequence scatter to win back)
    scoped_vmem_limit_kib: int = 0
    embedding_dim: int = 8
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    # () = the schema's first label (read_comment on WeChat — identical to
    # the reference default; rating_ge_4 on douban)
    task_names: tuple[str, ...] = ()


class DeepFM(nn.Module):
    config: DeepFMConfig
    schema: Schema

    @property
    def tasks(self) -> tuple[str, ...]:
        return self.config.task_names or (self.schema.labels[0],)

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        fields_spec = common.reference_or_schema_fields(self.schema)
        # first-order over multi-hot sequence fields sums the per-id weights
        first_spec = [(k, v, "sum" if kind == "mean" else kind)
                      for k, v, kind in fields_spec]
        first_order = common.FirstOrderLogit(
            schema=self.schema, fields=first_spec, name="first_order"
        )(batch)

        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(
                self.schema, cfg.embedding_dim,
                sorted({v for _, v, _ in fields_spec}),
            ),
            fields=fields_spec,
        )
        fields = embedder(batch)
        field_emb = common.stack_fields(fields)  # (B, F, K)
        second_order = jnp.sum(fm_pool(field_emb), axis=-1)  # (B,)

        deep_in = jnp.concatenate(fields, axis=-1)  # (B, F*K)
        deep_logit = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            logits_dim=1,
            compute_dtype=cfg.compute_dtype,
            name="deep",
        )(deep_in, train)[:, 0]

        return {self.tasks[0]: first_order + second_order + deep_logit}


common.register_model("DeepFM", DeepFMConfig, DeepFM)
