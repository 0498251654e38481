"""PLE: Progressive Layered Extraction for multi-task CTR.

Reference: algorithm/PLE/ple.py — input = concat(dense, W&D-family
embeddings) (L160-169); ``num_extract_network`` stacked extraction networks
(L172-180, extraction_network.py — note the reference *sums* per-task and
all-expert outputs into a single tensor, reproduced in
ops/experts.ExtractionNetwork); a final CGC layer with per-task gates over
(task ∪ shared) experts feeding per-task towers (L183-236); loss/metrics as
MMOE.  Baselines (best per column, README.md:43): read_comment 0.91965175 /
like 0.8136461 / click_avatar 0.8154559.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.dcn import WD_FIELDS
from recalgorithm_tpu.ops.experts import (
    ExpertGroup,
    ExtractionNetwork,
    SoftmaxGate,
    TaskTower,
    mix_experts,
)


@dataclasses.dataclass(frozen=True)
class PLEConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)  # tower hidden units
    batch_norm: bool = True
    dropout_rate: float = 0.1
    num_extract_network: int = 1
    num_experts_per_task: tuple[int, ...] = (5, 5, 5)
    num_experts_in_shared: int = 10
    expert_hidden_units: int = 256
    task_names: tuple[str, ...] = ("read_comment", "like", "click_avatar")


class PLE(nn.Module):
    config: PLEConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=WD_FIELDS
        )
        x = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        for i in range(cfg.num_extract_network):
            x = ExtractionNetwork(
                task_names=cfg.task_names,
                num_experts_per_task=cfg.num_experts_per_task,
                num_experts_in_shared=cfg.num_experts_in_shared,
                expert_hidden_units=cfg.expert_hidden_units,
                compute_dtype=cfg.compute_dtype,
                name=f"extract_network_{i}",
            )(x)

        # final CGC: per-task gates over (task ∪ shared) experts
        # (ple.py:183-228).  All final expert groups run as ONE stacked
        # einsum (param layout stays per-group via ExpertGroup.weights);
        # per-task mixes slice their (task ++ shared) slots out of it.
        groups = [
            ExpertGroup(n_task, cfg.expert_hidden_units,
                        compute_dtype=cfg.compute_dtype,
                        name=f"experts_final_{task}")
            for task, n_task in zip(cfg.task_names, cfg.num_experts_per_task)
        ] + [ExpertGroup(cfg.num_experts_in_shared, cfg.expert_hidden_units,
                         compute_dtype=cfg.compute_dtype,
                         name="experts_shared_final")]
        ws, bs = zip(*(g.weights(x.shape[-1]) for g in groups))
        w_all = jnp.concatenate(ws, axis=0)
        b_all = jnp.concatenate(bs, axis=0)
        xc = x if cfg.compute_dtype is None else x.astype(cfg.compute_dtype)
        wc = (w_all if cfg.compute_dtype is None
              else w_all.astype(cfg.compute_dtype))
        h = nn.relu(
            jnp.einsum("bi,eih->beh", xc, wc,
                       preferred_element_type=jnp.float32) + b_all
        )  # (B, sumE, H); slots = [task experts..., shared]
        offs = [0]
        for n_task in cfg.num_experts_per_task:
            offs.append(offs[-1] + n_task)
        shared = h[:, offs[-1]:, :]
        out = {}
        for i, task in enumerate(cfg.task_names):
            combined = jnp.concatenate(
                [h[:, offs[i]:offs[i + 1], :], shared], axis=1
            )
            gate = SoftmaxGate(combined.shape[1], name=f"gate_final_{task}")(x)
            tower_in = mix_experts(combined, gate)
            out[task] = TaskTower(
                cfg.hidden_units, cfg.dropout_rate, cfg.batch_norm,
                compute_dtype=cfg.compute_dtype, name=f"tower_{task}",
            )(tower_in, train)[:, 0]
        return out


common.register_model("PLE", PLEConfig, PLE)
