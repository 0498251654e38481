"""GDCN: Gated Deep & Cross Network (beyond-reference addition).

Wang et al., CIKM'23 (arXiv:2311.04635) — DCNv2's cross layers with a
learned sigmoid gate per dimension: ``x_{l+1} = x0 * (W x_l + b) *
sigmoid(G x_l) + x_l``, the paper's key claim being that gating lets the
stack go deeper without the noise accumulation that caps plain DCNv2.
Same WeChat feature surface as DCN/DCNv2 (reference dcn.py) so all three
cross generations compare directly; 'parallel'/'stacked' wirings as in
DCNv2 (GDCN-P / GDCN-S in the paper).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.dcn import WD_FIELDS
from recalgorithm_tpu.ops.interactions import CrossNetworkV2
from recalgorithm_tpu.ops.mlp import Dense, MLPTower


@dataclasses.dataclass(frozen=True)
class GDCNConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)
    num_cross_layer: int = 3  # gating is what makes depth pay (paper §4.3)
    structure: str = "parallel"  # 'parallel' (GDCN-P) | 'stacked' (GDCN-S)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment",)


class GDCN(nn.Module):
    config: GDCNConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=WD_FIELDS
        )
        x0 = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        cross_out = CrossNetworkV2(
            cfg.num_cross_layer, gated=True, name="gated_cross"
        )(x0)
        deep = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
            name="deep",
        )
        if cfg.structure == "stacked":
            logit_in = deep(cross_out, train)
        elif cfg.structure == "parallel":
            logit_in = jnp.concatenate([cross_out, deep(x0, train)], axis=-1)
        else:
            raise ValueError(
                f"structure must be parallel/stacked, got {cfg.structure!r}"
            )
        logit = Dense(1, name="logit")(logit_in)[:, 0]
        return {"read_comment": logit}


common.register_model("GDCN", GDCNConfig, GDCN)
