"""NFM: bi-interaction pooling -> DNN, plus a dense linear term.

Reference: algorithm/NFM/nfm.py — dense linear logit (L147-149); bi-interaction
= FM sum-square pooling kept as a (B, K) vector (L155-168) -> BatchNorm +
fixed 0.1 dropout (L169-171, reproduced verbatim incl. the hard-coded rate)
-> MLP(relu -> BN -> dropout) -> Dense(1) (L172-180); logit = dense + dnn.
Baseline: read_comment AUC 0.9148676 (NFM/result.md:13).
"""

from __future__ import annotations

import dataclasses

import jax
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.afm import AFM_FIELDS, AFM_VOCABS
from recalgorithm_tpu.ops.interactions import fm_pool
from recalgorithm_tpu.ops.mlp import Dense, MLPTower


@dataclasses.dataclass(frozen=True)
class NFMConfig(common.TrainFlags):
    # measured: the 64MB scoped-VMEM budget hurts this pure-FM
    # model's fusion choices (no sequence scatter to win back)
    scoped_vmem_limit_kib: int = 0
    embedding_dim: int = 8
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment",)


class NFM(nn.Module):
    config: NFMConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        dense_logit = Dense(1, name="dense_logit")(batch["dense"])[:, 0]
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(self.schema, cfg.embedding_dim, AFM_VOCABS),
            fields=AFM_FIELDS,
        )
        field_emb = common.stack_fields(embedder(batch))
        x = fm_pool(field_emb)  # (B, K)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            name="bi_interaction_bn",
        )(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)  # nfm.py:171 hard-codes 0.1
        # reference MLP order here is dense-relu -> BN -> dropout (nfm.py:175-179)
        for i, unit in enumerate(cfg.hidden_units):
            x = nn.relu(Dense(unit, dtype=cfg.compute_dtype, name=f"dense_{i}")(x))
            if cfg.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    name=f"bn_{i}",
                )(x)
            if 0.0 < cfg.dropout_rate < 1.0:
                x = nn.Dropout(cfg.dropout_rate, deterministic=not train)(x)
        nfm_logit = Dense(1, name="logit")(x)[:, 0]
        return {"read_comment": dense_logit + nfm_logit}


common.register_model("NFM", NFMConfig, NFM)
