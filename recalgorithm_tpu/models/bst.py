"""BST: Behavior Sequence Transformer.

Reference: algorithm/BST/bst.py — target + behaviour sequence concatenated to
(B, T+1, K) with the target at slot 0 (L184); ``num_transformer_block``
transformer blocks with keys_length+1 (L186-194, transformer_layer.py);
sum/mean pooling over the sequence axis (L195-198); concat(dense, category,
pooled) -> MLP (L200-211).  Parity quirk reproduced: the reference's dnn_part
applies NO activation between dense layers (bst.py:205, dense(..,
activation=None) -> BN -> dropout); ``mlp_activation`` defaults to "none"
accordingly, set "relu" for the conventional tower.
Baseline: read_comment AUC 0.9165866 (README.md:32).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.din import DIN_CATEGORY_FIELDS
from recalgorithm_tpu.ops.attention import BSTTransformerBlock, resolve_fused
from recalgorithm_tpu.ops.mlp import Dense


@dataclasses.dataclass(frozen=True)
class BSTConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    sequence_max_length: int = 50
    num_transformer_block: int = 1
    num_transformer_heads: int = 3
    pooling_method: str = "sum"  # {'sum', 'mean'}
    # Pallas MHA core: "auto" = on for TPU backends (resolve_fused)
    use_fused_attention: str = "auto"
    save_attn_bf16: bool = False  # bf16 saved attention probs (fused path)
    kernel_layout_attn: bool = False  # (H,T*d,B)-layout kernel boundary
    attn_interpret: bool = False  # run the Pallas kernel interpreted (CPU debug)
    mlp_activation: str = "none"  # reference parity; "relu" for standard MLP
    task_names: tuple[str, ...] = ("read_comment",)


class BST(nn.Module):
    config: BSTConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=DIN_CATEGORY_FIELDS
        )
        category = jnp.concatenate(embedder(batch), axis=-1)
        target = embedder.embed.embed_scalar("feedid", batch["feedid"])  # (B, K)
        seq = embedder.embed.embed_sequence(
            "feedid", batch["his_read_comment_7d_seq"]
        )  # (B, T, K)
        lengths = batch["his_read_comment_7d_seq_len"]

        x = jnp.concatenate([target[:, None, :], seq], axis=1)  # (B, T+1, K)
        for i in range(cfg.num_transformer_block):
            x = BSTTransformerBlock(
                num_heads=cfg.num_transformer_heads,
                max_length=cfg.sequence_max_length + 1,
                fused=resolve_fused(cfg.use_fused_attention),
                save_attn_bf16=cfg.save_attn_bf16,
                kernel_layout=cfg.kernel_layout_attn,
                interpret=cfg.attn_interpret,
                name=f"transformer_{i}",
            )(x, lengths + 1)
        if cfg.pooling_method == "sum":
            pooled = jnp.sum(x, axis=1)
        else:
            pooled = jnp.mean(x, axis=1)

        net = jnp.concatenate([batch["dense"], category, pooled], axis=-1)
        for i, unit in enumerate(cfg.hidden_units):
            net = Dense(unit, dtype=cfg.compute_dtype, name=f"dense_{i}")(net)
            if cfg.mlp_activation == "relu":
                net = nn.relu(net)
            if cfg.batch_norm:
                net = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    name=f"bn_{i}",
                )(net)
            if 0.0 < cfg.dropout_rate < 1.0:
                net = nn.Dropout(cfg.dropout_rate, deterministic=not train)(net)
        logit = Dense(1, name="logit")(net)[:, 0]
        return {"read_comment": logit}


common.register_model("BST", BSTConfig, BST)
