"""Shared model scaffolding: configs, field groupings, the model registry.

Field-group conventions extracted from the reference's per-model
``create_feature_columns()`` functions:

  * "W&D family" (Wide&Deep, DeepCrossing, DCN, DIN, BST, MMOE, PLE) uses
    fixed per-field dims — userid 16, feedid 16 (table shared with the
    behaviour sequence), device 2, authorid 4, bgm_song_id 4,
    bgm_singer_id 4, manual_tag 4 (wide_and_deep.py:108-114, mmoe.py:103-109).
  * "FM family" (DeepFM, FFM, FwFM, AFM, NFM, PNN, xDeepFM, FiBiNET) uses one
    uniform ``--embedding_dim`` for all fields (deepfm.py:83-89).
  * Which fields each model consumes (verified against each create_feature_
    columns):
      - DeepFM/FFM/FwFM: the 6 scalar categorical fields only.
      - AFM/NFM: dense + 7 fields (6 scalar + manual_tag mean), no sequence.
      - PNN: 8 embedding fields (6 scalar + manual_tag mean + behaviour-seq
        mean sharing the feedid table), no dense.
      - DeepCrossing/DCN/xDeepFM/FiBiNET/MMOE/PLE: dense + the 8 fields.
      - DIN/BST/DIEN: dense + 6 scalar fields + target feedid + raw sequence.

All models expose: ``__call__(batch, train) -> {task_name: (B,) logits}``;
regularisation terms are sowed into the ``"losses"`` collection which the
train loop sums into the objective (replacing TF's REGULARIZATION_LOSSES /
hand-added terms, pnn.py:209-211, din.py:254-257).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.embed.tables import (
    EmbeddingCollection,
    TableSpec,
    tables_for_fields,
)
from recalgorithm_tpu.features.schema import Schema

# Fixed per-vocab embedding dims of the W&D family (wide_and_deep.py:108-114).
WD_FAMILY_DIMS: dict[str, int] = {
    "userid": 16,
    "feedid": 16,
    "device": 2,
    "authorid": 4,
    "bgm_song_id": 4,
    "bgm_singer_id": 4,
    "manual_tag_id": 4,
}

SCALAR_CAT_FIELDS = (
    "userid",
    "feedid",
    "device",
    "authorid",
    "bgm_song_id",
    "bgm_singer_id",
)


def schema_fields(
    schema: Schema, *, sequences: str | None = "mean"
) -> list[tuple[str, str, str]]:
    """Generic field list derived from a Schema: every categorical feature
    as a scalar field, every sequence feature pooled (``sequences`` kind,
    'mean'/'sum'; None drops them) — the hook that makes a model train on
    any dataset's schema (wechat, douban, ...)."""
    fields = [(f.name, f.vocab, "scalar") for f in schema.categorical]
    if sequences:
        fields += [(f.name, f.vocab, sequences) for f in schema.sequence]
    return fields


def reference_or_schema_fields(
    schema: Schema, *, sequences: str | None = "mean"
) -> list[tuple[str, str, str]]:
    """Reference-parity fields on the WeChat schema, schema-derived fields
    anywhere else.

    The reference's per-model ``create_feature_columns()`` hand-writes the 6
    scalar WeChat fields (e.g. deepfm.py:56-95) — models keep that exact
    list on WeChat-shaped schemas so golden bands and parity notes stay
    valid, and fall back to :func:`schema_fields` on any other dataset
    (douban, future ones), making dataset support a framework property
    rather than a per-model rewrite."""
    names = {f.name for f in schema.categorical}
    if set(SCALAR_CAT_FIELDS) <= names:
        return [(n, n, "scalar") for n in SCALAR_CAT_FIELDS]
    return schema_fields(schema, sequences=sequences)


@dataclasses.dataclass(frozen=True)
class TrainFlags:
    """Common training flags (reference header, wide_and_deep.py:24-39)."""

    batch_size: int = 1024
    learning_rate: float = 0.005
    optimizer: str = "adam"
    # LR schedule (beyond reference — fixed LR upstream): 'constant',
    # 'cosine' or 'exponential', with linear warmup over warmup_steps;
    # see train/optimizers.make_schedule
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 0
    train_steps: int = 10000
    num_epochs: int = 1
    shuffle_buffer_size: int = 10000
    save_checkpoints_steps: int = 1000
    # 'f32' or 'bf16': compute dtype of the dense-tower/expert matmuls (MXU
    # mixed precision; params, BN stats, interaction ops and losses stay f32).
    precision: str = "f32"
    # XLA scoped-VMEM budget (KiB) for the compiled steps; 0 = compiler
    # default (16 MB).  64 MB keeps the whole feedid table VMEM-resident
    # through the embedding-grad scatter: +7..30% on every sequence-table
    # model (DIN/BST/DCN/MMOE/PLE/W&D/...).  The pure-FM models override
    # this to 0 — the larger budget changes their fusion choices for the
    # worse (measured -11..-37%: AFM/DeepFM/FFM/FwFM/NFM).
    scoped_vmem_limit_kib: int = 65536

    @property
    def compute_dtype(self):
        if self.precision == "f32":
            return None
        if self.precision == "bf16":
            return jnp.bfloat16
        raise ValueError(f"unknown precision {self.precision!r}")


def uniform_tables(
    schema: Schema, embedding_dim: int, vocabs: Sequence[str]
) -> dict[str, TableSpec]:
    """FM-family tables: one dim for every vocab in ``vocabs``."""
    return {
        v: TableSpec(v, schema.vocab_sizes[v], embedding_dim) for v in vocabs
    }


def wd_tables(schema: Schema) -> dict[str, TableSpec]:
    """W&D-family tables with the fixed per-field dims."""
    return {
        v: TableSpec(v, schema.vocab_sizes[v], d) for v, d in WD_FAMILY_DIMS.items()
    }


class FieldEmbedder(nn.Module):
    """Materialises the model's field-embedding list from a batch.

    One EmbeddingCollection (always named 'embed' — the sharding rules in
    parallel/mesh.py key on that name) plus declarative field specs:
    ``fields`` is a sequence of (batch_key, vocab, kind) with kind in
    {'scalar', 'mean'}; outputs are stacked in order.
    """

    tables: Mapping[str, TableSpec]
    fields: Sequence[tuple[str, str, str]]

    def setup(self):
        self.embed = EmbeddingCollection(tables=dict(self.tables), name="embed")

    def field_list(self, batch) -> list[jax.Array]:
        out = []
        for key, vocab, kind in self.fields:
            if kind == "scalar":
                out.append(self.embed.embed_scalar(vocab, batch[key]))
            elif kind == "mean":
                out.append(self.embed.embed_pooled(vocab, batch[key], "mean"))
            else:
                raise ValueError(f"unknown field kind {kind!r}")
        return out

    def __call__(self, batch) -> list[jax.Array]:
        return self.field_list(batch)


class FirstOrderLogit(nn.Module):
    """FM first-order term: Dense(1) over one-hot indicators == per-id weight sum.

    The reference materialises full one-hot vectors and a Dense(1)
    (deepfm.py:179-181, ffm.py:123-125) — O(B x |V|) memory.  A weight-per-id
    table lookup is the same linear map computed sparsely; PAD/OOV ids (0)
    contribute nothing, matching the all-zero one-hot row TF produces for OOV.
    Tables are created inside a nested collection named 'embed_w' so the mesh
    sharding rules row-shard them with the other tables.
    """

    schema: Schema
    fields: Sequence[tuple[str, str, str]]  # (batch_key, vocab, scalar|sum|mean)

    @nn.compact
    def __call__(self, batch) -> jax.Array:  # (B,)
        # width stays 1 here: these are (B,)-sized lookups where the backward
        # scatter dominates, and widening multiplies scatter bytes 8x
        # (measured: DeepFM 2.6M -> 1.5M ex/s with width 8).  The W&D cross
        # table (B*T ids, gather-dominated) uses the opposite trade.
        tables = {
            vocab: TableSpec(vocab, self.schema.vocab_sizes[vocab], 1, init="zeros")
            for _, vocab, _ in self.fields
        }
        embed = EmbeddingCollection(tables=tables, name="embed_w")
        total = self.param("bias", nn.initializers.zeros, (1,))[0]
        out = jnp.zeros((), jnp.float32)
        for key, vocab, kind in self.fields:
            if kind == "scalar":
                w = embed.embed_scalar(vocab, batch[key])[:, 0]
            else:
                w = embed.embed_pooled(vocab, batch[key], kind)[:, 0]
            out = out + w
        return out + total


def stack_fields(field_list: list[jax.Array]) -> jax.Array:
    """list of (B, K) with equal K -> (B, F, K)."""
    return jnp.stack(field_list, axis=1)


def sigmoid_tasks(logits: Mapping[str, jax.Array]) -> dict[str, jax.Array]:
    return {k: jax.nn.sigmoid(v) for k, v in logits.items()}


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

MODEL_REGISTRY: dict[str, tuple[type, type]] = {}


def register_model(name: str, config_cls: type, model_cls: type) -> None:
    MODEL_REGISTRY[name] = (config_cls, model_cls)


def get_model(name: str) -> tuple[type, type]:
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name]
