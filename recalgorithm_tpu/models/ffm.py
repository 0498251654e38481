"""FFM: field-aware factorization machine.

Reference: algorithm/FFM/ffm.py — first order as in DeepFM (L123-125);
second order (L128-160): each field i owns an (F-1, |V_i|, K) embedding
variable; for a pair (i < j), v_i comes from field i's (j-1)-th sub-table and
v_j from field j's i-th sub-table; logit += <v_i, v_j>.

TPU-first restructuring: field i's variable becomes ONE (|V_i|+1, (F-1)*K)
table — a single gather per field fetches all F-1 pair embeddings at once
(the reference does F-1 separate safe_embedding_lookup_sparse calls per
field), then the static pair index set selects the right sub-vectors.  This
is also the one reference model whose tables genuinely motivate row-sharding
(SURVEY.md §7 "hard parts"): (F-1)x larger than a plain FM.

Baseline: read_comment AUC 0.8911285 (README.md:20).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.embed.tables import EmbeddingCollection, TableSpec
from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common

SCALAR_FIELDS = [(n, n, "scalar") for n in common.SCALAR_CAT_FIELDS]


@dataclasses.dataclass(frozen=True)
class FFMConfig(common.TrainFlags):
    # measured: the 64MB scoped-VMEM budget hurts this pure-FM
    # model's fusion choices (no sequence scatter to win back)
    scoped_vmem_limit_kib: int = 0
    embedding_dim: int = 8
    task_names: tuple[str, ...] = ("read_comment",)


class FFM(nn.Module):
    config: FFMConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        k = self.config.embedding_dim
        fields = common.SCALAR_CAT_FIELDS
        num_fields = len(fields)

        first_order = common.FirstOrderLogit(
            schema=self.schema, fields=SCALAR_FIELDS, name="first_order"
        )(batch)

        # One wide table per field: (|V_i|+1, (F-1)*K).
        tables = {
            name: TableSpec(name, self.schema.vocab_sizes[name], (num_fields - 1) * k)
            for name in fields
        }
        embed = EmbeddingCollection(tables=tables, name="embed")
        # per-field lookups -> (B, F-1, K) pair-embedding banks
        banks = [
            embed.embed_scalar(name, batch[name]).reshape(-1, num_fields - 1, k)
            for name in fields
        ]

        logit = first_order
        for i in range(num_fields - 1):
            for j in range(i + 1, num_fields):
                # reference indexing (ffm.py:150-157): field i uses sub-table
                # j-1; field j uses sub-table i.
                vi = banks[i][:, j - 1, :]
                vj = banks[j][:, i, :]
                logit = logit + jnp.sum(vi * vj, axis=-1)
        return {"read_comment": logit}


common.register_model("FFM", FFMConfig, FFM)
