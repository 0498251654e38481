"""AFM: attentional FM over pairwise Hadamard products, plus a dense linear term.

Reference: algorithm/AFM/afm.py — dense linear logit (L144-146); 7 uniform-dim
embedding fields (6 scalar + mean-pooled manual_tag, L94-102); all pair
Hadamard products (L160-165); attention MLP h^T relu(Wp + b) softmaxed over
pairs (L167-182); attention-weighted sum projected by p-vector (L184-188).
Baseline: read_comment AUC 0.9117872 (README.md:26).
"""

from __future__ import annotations

import dataclasses

import jax
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.interactions import AFMAttention, pairwise_hadamard
from recalgorithm_tpu.ops.mlp import Dense, glorot_uniform

AFM_FIELDS = [(n, n, "scalar") for n in common.SCALAR_CAT_FIELDS] + [
    ("manual_tag_list", "manual_tag_id", "mean")
]
AFM_VOCABS = tuple(common.SCALAR_CAT_FIELDS) + ("manual_tag_id",)


@dataclasses.dataclass(frozen=True)
class AFMConfig(common.TrainFlags):
    # measured: the 64MB scoped-VMEM budget hurts this pure-FM
    # model's fusion choices (no sequence scatter to win back)
    scoped_vmem_limit_kib: int = 0
    embedding_dim: int = 8
    attention_factor: int = 128
    task_names: tuple[str, ...] = ("read_comment",)


class AFM(nn.Module):
    config: AFMConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        dense_logit = Dense(1, name="dense_logit")(batch["dense"])[:, 0]
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(
                self.schema, self.config.embedding_dim, AFM_VOCABS
            ),
            fields=AFM_FIELDS,
        )
        field_emb = common.stack_fields(embedder(batch))  # (B, F, K)
        pairs = pairwise_hadamard(field_emb)  # (B, P, K)
        weighted = AFMAttention(self.config.attention_factor, name="attention")(pairs)
        p = self.param("p", glorot_uniform, (self.config.embedding_dim, 1))
        afm_logit = (weighted @ p)[:, 0]
        return {"read_comment": dense_logit + afm_logit}


common.register_model("AFM", AFMConfig, AFM)
