"""MaskNet: instance-guided multiplicative masks over the embedding
(beyond-reference addition).

No reference counterpart — Wang et al. 2021 (arXiv:2102.07619), on the
FiBiNET surface (dense features + the 8 uniform-dim fields).  The flat
field embedding is LayerNorm'd per field (the paper's LN-EMB, §3.1) and
fed through ``num_blocks`` MaskBlocks (ops/interactions.MaskBlock), each
multiplying its input by an instance-specific mask generated from the
raw flat embedding.  Two stackings from the paper:

  * ``parallel`` (MaskNet-P, §3.4): every block masks the shared LN'd
    embedding; outputs concatenate into an MLP head.
  * ``serial``  (MaskNet-S, §3.4): blocks chain output-to-input, a
    Dense(1) reads the last block.

Dense features join the mask generator and the head (the paper's numeric
fields are embedded; here they gate and feed the head directly, which
keeps the reference's dense-vector treatment used across the zoo).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.pnn import PNN_FIELDS, PNN_VOCABS
from recalgorithm_tpu.ops.interactions import MaskBlock
from recalgorithm_tpu.ops.mlp import Dense, MLPTower


@dataclasses.dataclass(frozen=True)
class MaskNetConfig(common.TrainFlags):
    embedding_dim: int = 16
    block_mode: str = "parallel"  # 'parallel' (MaskNet-P) or 'serial' (-S)
    num_blocks: int = 3
    block_output_size: int = 64
    mask_agg_ratio: float = 2.0  # mask bottleneck = ratio * flat-emb dim
    hidden_units: tuple[int, ...] = (128, 64)  # parallel-mode head MLP
    batch_norm: bool = False  # paper uses LN inside blocks; head stays lean
    dropout_rate: float = 0.1
    task_names: tuple[str, ...] = ("read_comment",)


class MaskNet(nn.Module):
    config: MaskNetConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(self.schema, cfg.embedding_dim, PNN_VOCABS),
            fields=PNN_FIELDS,
        )
        field_emb = common.stack_fields(embedder(batch))  # (B, F, K)
        # LN-EMB: per-field LayerNorm, then flatten (arXiv:2102.07619 §3.1)
        ln_emb = nn.LayerNorm(name="ln_emb")(field_emb)
        ln_flat = ln_emb.reshape(ln_emb.shape[0], -1)
        mask_input = jnp.concatenate(
            [batch["dense"], field_emb.reshape(field_emb.shape[0], -1)], axis=-1
        )
        agg_size = int(cfg.mask_agg_ratio * ln_flat.shape[-1])

        if cfg.block_mode == "parallel":
            outs = [
                MaskBlock(cfg.block_output_size, agg_size, name=f"block_{i}")(
                    ln_flat, mask_input
                )
                for i in range(cfg.num_blocks)
            ]
            x = jnp.concatenate(outs + [batch["dense"]], axis=-1)
            logit = MLPTower(
                hidden_units=cfg.hidden_units,
                dropout_rate=cfg.dropout_rate,
                batch_norm=cfg.batch_norm,
                logits_dim=1,
                compute_dtype=cfg.compute_dtype,
                name="head",
            )(x, train)[:, 0]
        elif cfg.block_mode == "serial":
            x = ln_flat
            for i in range(cfg.num_blocks):
                x = MaskBlock(cfg.block_output_size, agg_size, name=f"block_{i}")(
                    x, mask_input
                )
            logit = Dense(1, name="logit")(
                jnp.concatenate([x, batch["dense"]], axis=-1)
            )[:, 0]
        else:
            raise ValueError(f"unknown block_mode {cfg.block_mode!r}")
        return {"read_comment": logit}


common.register_model("MaskNet", MaskNetConfig, MaskNet)
