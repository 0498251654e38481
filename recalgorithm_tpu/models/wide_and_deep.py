"""Wide&Deep: hashed-cross wide part + MLP deep part with dual optimizers.

Reference: algorithm/WideAndDeep/wide_and_deep.py.
  * wide part (L121-124, 208-210): indicator of crossed_column(userid x
    manual_tag, 100k buckets) -> Dense(1).  Here: on-device hashed cross of
    the integer ids (embed/cross.py) -> weight-per-bucket sum + bias — the
    identical linear map without materialising (B, 100000) one-hots.
  * deep part (L213-222): dense + W&D-family embeddings -> MLP(relu ->
    dropout -> BN) -> Dense(1).
  * dual optimizer (L251-276): FTRL on wide params, configurable optimizer on
    deep params — expressed via ``wide_param_predicate`` +
    ``train.optimizers.dual_wide_deep``.

The reference also ships wide_and_deep_builtin.py (the canned
DNNLinearCombinedClassifier, same features/architecture); this module covers
both since the canned estimator is the same model.

Baseline: read_comment AUC 0.9133482 (README.md:23).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.embed.cross import hashed_cross
from recalgorithm_tpu.embed.tables import EmbeddingCollection, TableSpec
from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.ops.mlp import MLPTower


@dataclasses.dataclass(frozen=True)
class WideAndDeepConfig(common.TrainFlags):
    wide_part_learning_rate: float = 0.005
    deep_part_learning_rate: float = 0.001
    deep_part_optimizer: str = "adam"
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.0
    cross_hash_buckets: int = 100_000
    task_names: tuple[str, ...] = ("read_comment",)


class WideAndDeep(nn.Module):
    config: WideAndDeepConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        # ---- wide: hashed cross -> per-bucket weights.  The cross spec
        # (which fields, bucket count) comes from the schema's CrossFeature
        # (features/schema.py wechat_schema: userid x manual_tag_list,
        # reference wide_and_deep.py:121-124); the --cross_hash_buckets flag
        # overrides the bucket count for sweep parity.
        spec = self.schema.cross[0]
        num_buckets = cfg.cross_hash_buckets or spec.num_buckets
        cross_ids = hashed_cross(
            batch[spec.keys[0]], batch[spec.keys[1]], num_buckets
        )  # (B, T_tag)
        wide_tables = {
            # width 8, only column 0 carries the weight: a width-1 gather
            # lowers to a 4x-slower element gather on TPU (measured 708us vs
            # 187us for 98k ids); the extra columns get zero gradients and
            # stay zero, so the linear map is unchanged.
            spec.name: TableSpec(
                spec.name, num_buckets, 8,
                init="zeros",  # linear weights; TF inits FTRL linear parts ~0
            )
        }
        wide_embed = EmbeddingCollection(tables=wide_tables, name="wide_embed_w")
        wide_bias = self.param("wide_bias", nn.initializers.zeros, (1,))
        wide_logit = (
            wide_embed.embed_pooled(spec.name, cross_ids, "sum")[:, 0]
            + wide_bias[0]
        )
        # tf.summary.histogram('wide_part_kernel') + its L2 norm
        # (wide_and_deep.py:288-291): only column 0 carries weight (see the
        # width-8 note above).  The Trainer histograms non-scalar summaries.
        wide_kernel = wide_embed.table(spec.name)[:, 0]
        keep = lambda prev, new: new
        self.sow("summaries", "wide_part_kernel", wide_kernel, reduce_fn=keep)
        self.sow("summaries", "wide_part_kernel_l2_norm",
                 jnp.sqrt(jnp.sum(wide_kernel**2)), reduce_fn=keep)

        # ---- deep: dense + embeddings -> MLP
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema),
            fields=[
                ("userid", "userid", "scalar"),
                ("device", "device", "scalar"),
                ("authorid", "authorid", "scalar"),
                ("bgm_song_id", "bgm_song_id", "scalar"),
                ("bgm_singer_id", "bgm_singer_id", "scalar"),
                ("manual_tag_list", "manual_tag_id", "mean"),
                ("feedid", "feedid", "scalar"),
                ("his_read_comment_7d_seq", "feedid", "mean"),
            ],
        )
        deep_in = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        deep_logit = MLPTower(
            hidden_units=cfg.hidden_units,
            dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm,
            logits_dim=1,
            compute_dtype=cfg.compute_dtype,
            name="deep",
        )(deep_in, train)[:, 0]

        return {"read_comment": wide_logit + deep_logit}

    @staticmethod
    def wide_param_predicate(path) -> bool:
        """Selects wide-part params for the FTRL side of the dual optimizer."""
        keys = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        return any(k.startswith("wide") for k in keys)


common.register_model("WideAndDeep", WideAndDeepConfig, WideAndDeep)
# The reference's wide_and_deep_builtin.py drives the same features and
# architecture through the canned tf.estimator.DNNLinearCombinedClassifier
# (wide_and_deep_builtin.py:186-193) — it is the same model behind a canned
# API, so the registry exposes it as an alias of this class.
common.register_model("WideAndDeepBuiltin", WideAndDeepConfig, WideAndDeep)
