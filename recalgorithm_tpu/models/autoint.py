"""AutoInt: automatic feature interaction via field self-attention
(beyond-reference addition).

No reference counterpart — the reference zoo stops at bilinear/CIN-style
interactions; this implements Song et al. 2019 (arXiv:1810.11921) on the
same uniform-dim field surface as PNN/FiBiNET: the 8 categorical fields
embed to (B, F, K), dense features project to one extra field (the
paper's numeric-feature embedding, §3.2), and ``att_layers`` stacked
InteractingLayers refine the field tensor before a flattened Dense(1)
logit.  Optionally a parallel MLP tower (AutoInt+, §4.6) adds its logit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.pnn import PNN_FIELDS, PNN_VOCABS
from recalgorithm_tpu.ops.attention import resolve_fused
from recalgorithm_tpu.ops.interactions import InteractingLayer
from recalgorithm_tpu.ops.mlp import Dense, MLPTower


@dataclasses.dataclass(frozen=True)
class AutoIntConfig(common.TrainFlags):
    embedding_dim: int = 16
    att_layers: int = 3
    num_heads: int = 2
    head_dim: int = 16
    # Pallas field-attention core: "auto" = on for TPU backends
    # (ops.attention.resolve_fused).  The plain einsum chain's (B, H, F, F)
    # tensors pad their 9-wide minor dims to 128 lanes — measured 3x the
    # step time of the fused path at batch 4096 (docs/ROADMAP.md round 4).
    use_fused_attention: str = "auto"
    use_deep_tower: bool = False  # AutoInt+ variant
    hidden_units: tuple[int, ...] = (256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment",)


class AutoInt(nn.Module):
    config: AutoIntConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(
                self.schema, cfg.embedding_dim, PNN_VOCABS
            ),
            fields=PNN_FIELDS,
        )
        fields = embedder(batch)
        # dense features as one learned field (paper §3.2 numeric embedding)
        fields.append(Dense(cfg.embedding_dim, name="dense_field")(batch["dense"]))
        x = common.stack_fields(fields)  # (B, F+1, K)
        fused = resolve_fused(cfg.use_fused_attention)
        for i in range(cfg.att_layers):
            # fused: chain the stacked layers in the Pallas kernel layout
            # (H, F, d, B) so the inter-layer transposes fold into the
            # projection contractions; only the last layer pays one
            # (B, F, H*d) un-transpose for the flattened logit.
            x = InteractingLayer(
                cfg.num_heads, cfg.head_dim, fused=fused,
                name=f"interact_{i}",
            )(
                x,
                kernel_in=fused and i > 0,
                kernel_out=fused and i < cfg.att_layers - 1,
            )
        logit = Dense(1, name="logit")(x.reshape(x.shape[0], -1))[:, 0]
        if cfg.use_deep_tower:
            deep_in = jnp.concatenate(
                [batch["dense"]] + [f for f in fields], axis=-1
            )
            deep_out = MLPTower(
                hidden_units=cfg.hidden_units,
                dropout_rate=cfg.dropout_rate,
                batch_norm=cfg.batch_norm,
                compute_dtype=cfg.compute_dtype,
                name="deep",
            )(deep_in, train)
            logit = logit + Dense(1, name="deep_logit")(deep_out)[:, 0]
        return {"read_comment": logit}


common.register_model("AutoInt", AutoIntConfig, AutoInt)
