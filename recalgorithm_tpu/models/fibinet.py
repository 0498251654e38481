"""FiBiNET: SENET field reweighting + bilinear pair interactions -> DNN.

Reference: algorithm/FiBiNET/fibinet.py — 8 uniform-dim embedding fields
(L106-116); dense-feature linear logit (L166-168); SENET stream (L171-174,
senet.py); bilinear interaction of both the original and SENET streams,
concatenated on K and flattened (L177-187, bilinear_interaction_layer.py);
MLP(relu -> dropout -> BN) -> Dense(1) (L189-197); logit = linear + dnn.
Baseline: read_comment AUC 0.9149044 (README.md:31).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.pnn import PNN_FIELDS, PNN_VOCABS
from recalgorithm_tpu.ops.interactions import BilinearInteraction, SENet
from recalgorithm_tpu.ops.mlp import Dense


@dataclasses.dataclass(frozen=True)
class FiBiNETConfig(common.TrainFlags):
    embedding_dim: int = 8
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    reduction_ratio: int = 2
    bilinear_interaction_type: str = "all"
    task_names: tuple[str, ...] = ("read_comment",)


class FiBiNET(nn.Module):
    config: FiBiNETConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        linear_logit = Dense(1, name="linear")(batch["dense"])[:, 0]
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(self.schema, cfg.embedding_dim, PNN_VOCABS),
            fields=PNN_FIELDS,
        )
        field_emb = common.stack_fields(embedder(batch))  # (B, F, K)
        senet_emb = SENet(cfg.reduction_ratio, name="senet")(field_emb)
        bi_orig = BilinearInteraction(
            cfg.bilinear_interaction_type, name="bilinear_original"
        )(field_emb)
        bi_senet = BilinearInteraction(
            cfg.bilinear_interaction_type, name="bilinear_senet"
        )(senet_emb)
        x = jnp.concatenate([bi_orig, bi_senet], axis=-1)  # (B, P, 2K)
        x = x.reshape(x.shape[0], -1)
        # reference MLP order here: dense-relu -> dropout -> BN (fibinet.py:190-195)
        for i, unit in enumerate(cfg.hidden_units):
            x = nn.relu(Dense(unit, dtype=cfg.compute_dtype, name=f"dense_{i}")(x))
            if 0.0 < cfg.dropout_rate < 1.0:
                x = nn.Dropout(cfg.dropout_rate, deterministic=not train)(x)
            if cfg.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    name=f"bn_{i}",
                )(x)
        dnn_logit = Dense(1, name="logit")(x)[:, 0]
        return {"read_comment": linear_logit + dnn_logit}


common.register_model("FiBiNET", FiBiNETConfig, FiBiNET)
