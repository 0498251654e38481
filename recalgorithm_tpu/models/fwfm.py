"""FwFM: field-weighted FM — pairwise dots scaled by learned pair strengths.

Reference: algorithm/FwFM/fwfm.py — first order as DeepFM (L135-137); second
order (L144-160): logit += r_ij * <v_i, v_j> over all pairs, with r a learned
length-F(F-1)/2 vector indexed by the upper-triangular map
(algorithm/utils.py:67-82).  Here the whole pair loop is one batched Gram
matmul (ops/interactions.pairwise_dot) dotted with the strength vector.
Baseline: read_comment AUC 0.9118794 (README.md:28).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.interactions import pairwise_dot
from recalgorithm_tpu.ops.mlp import glorot_uniform

SCALAR_FIELDS = [(n, n, "scalar") for n in common.SCALAR_CAT_FIELDS]


@dataclasses.dataclass(frozen=True)
class FwFMConfig(common.TrainFlags):
    # measured: the 64MB scoped-VMEM budget hurts this pure-FM
    # model's fusion choices (no sequence scatter to win back)
    scoped_vmem_limit_kib: int = 0
    embedding_dim: int = 8
    task_names: tuple[str, ...] = ("read_comment",)


class FwFM(nn.Module):
    config: FwFMConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        first_order = common.FirstOrderLogit(
            schema=self.schema, fields=SCALAR_FIELDS, name="first_order"
        )(batch)
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(
                self.schema, self.config.embedding_dim, common.SCALAR_CAT_FIELDS
            ),
            fields=SCALAR_FIELDS,
        )
        field_emb = common.stack_fields(embedder(batch))  # (B, F, K)
        num_fields = field_emb.shape[1]
        num_pairs = num_fields * (num_fields - 1) // 2
        strength = self.param(
            "fields_pair_strength_weight", glorot_uniform, (num_pairs, 1)
        )[:, 0]
        dots = pairwise_dot(field_emb)  # (B, P) in utils.py pair order
        second_order = dots @ strength
        return {"read_comment": first_order + second_order}


common.register_model("FwFM", FwFMConfig, FwFM)
