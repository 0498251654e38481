"""Shared-Bottom: the classic hard-parameter-sharing multi-task baseline.

Beyond-reference model (the reference ships MMOE and PLE but not the
baseline both papers compare against — Caruana's hard sharing, the "Shared-
Bottom" rows of the MMOE paper, KDD'18 §4, and the PLE paper, RecSys'20):
input = concat(dense, W&D-family embeddings) — the same input surface as
MMOE (reference mmoe.py:199-205) — through ONE shared bottom MLP, then a
per-task TaskTower head (reference MMOE/tower_layer.py:4-28 semantics).

Completes the multi-task family: SharedBottom (hard sharing) vs MMOE
(soft expert sharing) vs PLE (progressive layered extraction) vs ESMM
(probability factorization), all on identical tasks/losses/metrics so the
reference's multi-task comparison methodology carries over directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.dcn import WD_FIELDS
from recalgorithm_tpu.ops.experts import TaskTower
from recalgorithm_tpu.ops.mlp import MLPTower


@dataclasses.dataclass(frozen=True)
class SharedBottomConfig(common.TrainFlags):
    bottom_hidden_units: tuple[int, ...] = (512, 256)
    hidden_units: tuple[int, ...] = (128, 64)  # per-task tower units
    batch_norm: bool = True
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment", "like", "click_avatar")


class SharedBottom(nn.Module):
    config: SharedBottomConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=WD_FIELDS
        )
        x = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        shared = MLPTower(
            hidden_units=cfg.bottom_hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            logits_dim=None,
            compute_dtype=cfg.compute_dtype,
            name="bottom",
        )(x, train)
        return {
            task: TaskTower(
                cfg.hidden_units, cfg.dropout_rate, cfg.batch_norm,
                compute_dtype=cfg.compute_dtype, name=f"tower_{task}",
            )(shared, train)[:, 0]
            for task in cfg.task_names
        }


common.register_model("SharedBottom", SharedBottomConfig, SharedBottom)
