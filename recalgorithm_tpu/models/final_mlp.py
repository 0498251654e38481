"""FinalMLP: two-stream MLP with feature gating and bilinear fusion
(beyond-reference addition).

No reference counterpart — Mao et al. 2023 (arXiv:2304.00902), a strong
modern two-stream CTR baseline, on the FiBiNET surface (dense features +
the 8 uniform-dim fields, fibinet.py:106-116 equivalent): per stream, a
feature-selection gate conditioned on a chosen field group (user-side
fields for stream 1, item-side for stream 2, §3.2) reweights the shared
flat embedding, an MLP tower digests it, and the stream outputs combine
through the multi-head bilinear fusion of ops/interactions.BilinearFusion
(§3.3) instead of concatenation.  Everything is static-shape dense
matmuls — the whole model is a handful of MXU contractions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.pnn import PNN_FIELDS, PNN_VOCABS
from recalgorithm_tpu.ops.interactions import BilinearFusion
from recalgorithm_tpu.ops.mlp import Dense, MLPTower


@dataclasses.dataclass(frozen=True)
class FinalMLPConfig(common.TrainFlags):
    embedding_dim: int = 16
    # stream towers (paper's MLP1/MLP2; symmetric by default)
    hidden_units: tuple[int, ...] = (256, 128)
    stream2_hidden_units: tuple[int, ...] | None = None  # None = same as 1
    batch_norm: bool = True
    dropout_rate: float = 0.1
    # feature-selection conditioning groups (§3.2): batch keys whose field
    # embeddings drive each stream's gate; empty = a learned static context
    fs1_fields: tuple[str, ...] = ("userid", "device")
    fs2_fields: tuple[str, ...] = ("feedid", "authorid")
    fs_hidden_units: tuple[int, ...] = (64,)
    fusion_heads: int = 2
    task_names: tuple[str, ...] = ("read_comment",)


class _FeatureSelection(nn.Module):
    """Gate = 2*sigmoid(MLP(context)) applied elementwise to the flat
    embedding (arXiv:2304.00902 §3.2).  The factor 2 keeps the gate's
    expected scale at 1 so an untrained gate is a no-op."""

    hidden_units: tuple[int, ...]

    @nn.compact
    def __call__(self, flat: jax.Array, ctx: jax.Array) -> jax.Array:
        g = ctx
        for i, units in enumerate(self.hidden_units):
            g = nn.relu(Dense(units, name=f"fs_{i}")(g))
        gate = 2.0 * nn.sigmoid(Dense(flat.shape[-1], name="fs_gate")(g))
        return flat * gate


class FinalMLP(nn.Module):
    config: FinalMLPConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.uniform_tables(self.schema, cfg.embedding_dim, PNN_VOCABS),
            fields=PNN_FIELDS,
        )
        fields = embedder(batch)
        by_key = {key: emb for (key, _, _), emb in zip(PNN_FIELDS, fields)}
        flat = jnp.concatenate([batch["dense"]] + fields, axis=-1)

        def context(keys: tuple[str, ...], name: str) -> jax.Array:
            if keys:
                return jnp.concatenate([by_key[k] for k in keys], axis=-1)
            # static learned context, broadcast over the batch (paper default
            # when no conditioning fields are configured)
            ctx = self.param(name, nn.initializers.zeros, (cfg.embedding_dim,))
            return jnp.broadcast_to(ctx, (flat.shape[0], cfg.embedding_dim))

        s1 = _FeatureSelection(cfg.fs_hidden_units, name="fs1")(
            flat, context(cfg.fs1_fields, "ctx1")
        )
        s2 = _FeatureSelection(cfg.fs_hidden_units, name="fs2")(
            flat, context(cfg.fs2_fields, "ctx2")
        )
        o1 = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
            name="stream1",
        )(s1, train)
        o2 = MLPTower(
            hidden_units=cfg.stream2_hidden_units or cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            compute_dtype=cfg.compute_dtype,
            name="stream2",
        )(s2, train)
        logit = BilinearFusion(cfg.fusion_heads, name="fusion")(o1, o2)
        return {"read_comment": logit}


common.register_model("FinalMLP", FinalMLPConfig, FinalMLP)
