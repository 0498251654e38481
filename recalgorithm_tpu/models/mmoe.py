"""MMOE: multi-gate mixture of experts for multi-task CTR.

Reference: algorithm/MMOE/mmoe.py — input = concat(dense, all W&D-family
embeddings) (L199-205); ``num_experts`` one-layer relu experts stacked
(L208-216, here one (E, in, H) einsum); bias-free softmax gate per task
(L218-224); gate-weighted expert mix -> tower_layer per task (L227-248);
loss = sum of per-task mean sigmoid CE (L261-263); per-task AUC/accuracy
(L265-274).  Baselines (best per column over the sweep, README.md:42):
read_comment 0.91860557 / like 0.8126400 / click_avatar 0.8139362.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.dcn import WD_FIELDS
from recalgorithm_tpu.ops.experts import ExpertGroup, SoftmaxGate, TaskTower, mix_experts


@dataclasses.dataclass(frozen=True)
class MMOEConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)  # tower hidden units
    batch_norm: bool = True
    dropout_rate: float = 0.1
    num_experts: int = 3
    expert_hidden_units: int = 512
    task_names: tuple[str, ...] = ("read_comment", "like", "click_avatar")


class MMOE(nn.Module):
    config: MMOEConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=WD_FIELDS
        )
        x = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        experts = ExpertGroup(
            cfg.num_experts, cfg.expert_hidden_units,
            compute_dtype=cfg.compute_dtype, name="experts",
        )(x)  # (B, E, H)
        out = {}
        for task in cfg.task_names:
            gate = SoftmaxGate(cfg.num_experts, name=f"gate_{task}")(x)
            tower_in = mix_experts(experts, gate)
            out[task] = TaskTower(
                cfg.hidden_units, cfg.dropout_rate, cfg.batch_norm,
                compute_dtype=cfg.compute_dtype, name=f"tower_{task}",
            )(tower_in, train)[:, 0]
        return out


common.register_model("MMOE", MMOEConfig, MMOE)
