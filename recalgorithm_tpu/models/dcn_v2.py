"""DCNv2: Deep & Cross Network v2 (beyond-reference addition).

The reference implements only DCN v1 (algorithm/DCN/dcn.py,
cross_layer.py:4-26); this adds the full-matrix cross of Wang et al. 2021
(arXiv:2008.13535) on the same WeChat feature surface as DCN so results
are directly comparable.  ``structure`` picks the paper's two wirings:
'parallel' (cross stack and MLP side by side, concatenated into the
logit — DCN v1's layout) or 'stacked' (MLP consumes the cross output).
``cross_low_rank > 0`` switches every cross layer to the DCN-Mix low-rank
factorisation.
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
class DCNv2Config(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)
    num_cross_layer: int = 2
    cross_low_rank: int = 0  # 0 = full (d, d) matrices; > 0 = DCN-Mix rank
    structure: str = "parallel"  # 'parallel' | 'stacked'
    batch_norm: bool = True
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment",)


class DCNv2(nn.Module):
    config: DCNv2Config
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=WD_FIELDS
        )
        x0 = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        cross_out = CrossNetworkV2(
            cfg.num_cross_layer, low_rank=cfg.cross_low_rank, name="cross_v2"
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


common.register_model("DCNv2", DCNv2Config, DCNv2)
