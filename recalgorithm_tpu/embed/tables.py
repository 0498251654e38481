"""Embedding engine: unified table store + lookups with TF-parity combiners.

Replaces the reference's ``tf.feature_column`` embedding machinery
(``fc.embedding_column`` / ``fc.shared_embedding_columns`` /
``safe_embedding_lookup_sparse``, reference wide_and_deep.py:108-118,
ffm.py:128-160) with an explicit table store designed for TPU:

  * each table is one dense ``(vocab_size + 1, dim)`` array — row 0 is the
    PAD/OOV row, always zero in effect (outputs are masked on ``id == 0`` so
    row 0 receives no gradient, matching TF's safe_embedding_lookup which
    zero-fills OOV/-1 ids),
  * shared embeddings (feedid <-> behaviour sequence) are expressed by two
    fields referencing one table name,
  * combiners: ``mean`` / ``sum`` over the valid prefix of a padded sequence,
    matching ``combiner='mean'`` semantics incl. zero-length rows -> zeros,
  * tables carry sharding metadata: rows are sharded over the mesh's
    ``data``/embedding axis via `flax.linen.with_partitioning`; under pjit
    the XLA SPMD partitioner turns the gathers into collectives.  A
    hand-optimised shard_map all-to-all lookup lives in embed/sharded.py.

Initializer parity: TF's ``embedding_column`` default is
``truncated_normal(stddev=1/sqrt(dim))``; we use the same.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


# Table rows are padded up to a multiple of this so row-sharding divides
# evenly on any mesh up to 256 chips; padding rows are unreachable (ids are
# always <= vocab_size) and receive no gradient.
ROW_ALIGN = 256

# Tables with at most this many (padded) rows use the dense one-hot-matmul
# lookup instead of gather: on TPU the gather's backward is an HBM scatter
# whose cost is ~12us per 1k ids regardless of vocab size (honest v5e
# measurement), while the dense path's backward is an MXU matmul — measured
# ~15x faster for the WeChat manual_tag table (512 rows, 98k ids/step at
# batch 4096).  The one-hot never materialises: XLA fuses the compare +
# reduce into the (B, R) multi-hot.
DENSE_LOOKUP_MAX_ROWS = 2048


# When set (via shard_map_lookups), gather-path lookups route through the
# hand-written shard_map exchange in embed/sharded.py instead of relying on
# the SPMD partitioner to derive collectives from the table's sharding
# annotation.  Trace-time state: the Trainer wraps its step functions so the
# mesh is visible while jit traces them.
_LOOKUP_MESH = None

# When True (via compact_grad_scatter), (B, T) sequence gathers route
# through ops/compact_scatter.take_compact_bwd: the backward compacts the
# valid-prefix entries to a static cap-sized buffer and scatters only those
# — 7-day behaviour sequences are ~85-90% PAD, and the XLA scatter pays per
# ENTRY whether or not it adds zero.  NOT exact on its own for dense
# batches: entries beyond the cap are dropped, and exactness relies on the
# HOST dispatcher (Trainer._train_step_for + compact_scatter.
# batch_fits_compact) routing overflowing batches to a plain-scatter
# executable — callers jitting train_step_fn directly must do the same or
# accept the cap contract.  Pure XLA: works on every backend and composes
# with jit/grad without Mosaic.
_COMPACT_SCATTER = False


@contextlib.contextmanager
def shard_map_lookups(mesh):
    """Route EmbeddingCollection lookups through the explicit shard_map
    exchange (embed/sharded.py) while tracing under this context."""
    global _LOOKUP_MESH
    prev, _LOOKUP_MESH = _LOOKUP_MESH, mesh
    try:
        yield
    finally:
        _LOOKUP_MESH = prev


@contextlib.contextmanager
def compact_grad_scatter(enabled: bool = True):
    """Enable the PAD-compacted sequence-gradient scatter while tracing."""
    global _COMPACT_SCATTER
    prev, _COMPACT_SCATTER = _COMPACT_SCATTER, enabled
    try:
        yield
    finally:
        _COMPACT_SCATTER = prev


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """One embedding table: ``vocab_size`` real rows + 1 PAD/OOV row,
    row-padded to ROW_ALIGN for even sharding.

    init: 'normal' = truncated_normal(1/sqrt(dim)) (TF embedding_column
    default); 'zeros' for linear/first-order weight tables — the reference's
    equivalent is a glorot Dense(1) over a |V|-wide one-hot, whose init scale
    ~sqrt(2/|V|) is effectively zero (truncated_normal(1.0) on a dim-1 table
    buries the first-order signal in noise and measurably slows FM-family
    convergence)."""

    name: str
    vocab_size: int
    dim: int
    init: str = "normal"

    @property
    def num_rows(self) -> int:
        needed = self.vocab_size + 1
        return ((needed + ROW_ALIGN - 1) // ROW_ALIGN) * ROW_ALIGN


def _table_init(dim: int):
    stddev = 1.0 / (dim**0.5)
    return nn.initializers.truncated_normal(stddev=stddev)


def _masked_one_hot(ids: jax.Array, num_rows: int, dtype) -> jax.Array:
    """one_hot(ids) with column 0 (PAD/OOV) forced to zero.

    Out-of-range ids match no column -> zero row, so the dense path needs no
    separate validity mask; row 0 of the table receives no gradient.
    """
    iota = jnp.arange(num_rows, dtype=ids.dtype)
    return ((ids[..., None] == iota) & (iota > 0)).astype(dtype)


class EmbeddingCollection(nn.Module):
    """All embedding tables of one model, with named-axis sharding metadata.

    Attributes:
      tables: table specs, keyed by table name.
      shard_axis: mesh axis name the vocabulary (row) dimension is sharded
        over, or None for replicated tables.  Row-sharding over the data axis
        is the classic recommender layout: tables are memory-heavy and
        lookups become all-to-alls over ICI.
    """

    tables: Mapping[str, TableSpec]
    shard_axis: str | None = None

    def setup(self):
        params = {}
        for name, spec in self.tables.items():
            init = (
                nn.initializers.zeros if spec.init == "zeros"
                else _table_init(spec.dim)
            )
            if self.shard_axis is not None:
                init = nn.with_partitioning(init, (self.shard_axis, None))
            params[name] = self.param(name, init, (spec.num_rows, spec.dim))
        self._params = params

    def table(self, name: str) -> jax.Array:
        return self._params[name]

    def _is_dense(self, table: str) -> bool:
        return self.tables[table].num_rows <= DENSE_LOOKUP_MAX_ROWS

    def _maybe_sharded_gather(self, tab: jax.Array, ids: jax.Array):
        """Route through the explicit shard_map exchange when enabled.

        Returns the (ids.shape, dim) embedding or None when the context is
        off / the shapes don't divide the mesh (callers fall back to the
        plain gather, whose collectives the partitioner derives).
        """
        mesh = _LOOKUP_MESH
        if mesh is None:
            return None
        from recalgorithm_tpu.embed.sharded import sharded_lookup
        from recalgorithm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        axes = tuple(a for a in (DATA_AXIS, MODEL_AXIS) if a in mesh.shape)
        n_shards = 1
        for a in axes:
            n_shards *= mesh.shape[a]
        flat_ids = ids.reshape(-1)
        if tab.shape[0] % n_shards or flat_ids.shape[0] % n_shards:
            return None
        emb = sharded_lookup(tab, flat_ids, mesh, axes, axes[0])
        return emb.reshape(*ids.shape, tab.shape[1])

    def _quantized_rows(self, table: str, ids: jax.Array) -> jax.Array | None:
        """Serving-time int8 lookup when a ``qtables`` collection is present.

        serving/quantize.py builds the collection (``<name>__q`` int8 rows +
        ``<name>__scale`` f32 per-row scales) mirroring the params tree, so
        scope resolution pairs each table with its quantized twin.  The
        gather moves ~4x fewer HBM bytes; dequant happens on the gathered
        rows only and fuses into the consumers.  Training paths never pass
        the collection and are unaffected.
        """
        if not self.has_variable("qtables", f"{table}__q"):
            return None
        q = self.get_variable("qtables", f"{table}__q")
        scale = self.get_variable("qtables", f"{table}__scale")
        rows = jnp.take(q, ids, axis=0, mode="clip").astype(scale.dtype)
        return rows * jnp.take(scale, ids, axis=0, mode="clip")

    def _gather(self, tab: jax.Array, ids: jax.Array) -> jax.Array:
        """Plain gather with the fastest available backward (no masking)."""
        emb = self._maybe_sharded_gather(tab, ids)
        if emb is not None:
            return emb
        if _COMPACT_SCATTER and ids.ndim == 2:
            from recalgorithm_tpu.ops import compact_scatter as cs

            # long sequences only: short-T lookups (tag lists, crosses)
            # run ~25%+ live and their narrow-row compaction gathers cost
            # more than the scatter they save (W&D 652k -> 612k ex/s
            # measured with the cross compacted; 7-day sequences at T=50
            # gain +11%).  Gate constants live in compact_scatter so the
            # host-side density check reads the same values.
            if (ids.size >= cs.MIN_IDS
                    and ids.shape[-1] >= cs.LONG_SEQ_T):
                return cs.take_compact_bwd(tab, ids)
        return jnp.take(tab, ids, axis=0, mode="clip")

    def embed_scalar(self, table: str, ids: jax.Array) -> jax.Array:
        """(B,) int ids -> (B, dim); id 0 (PAD/OOV) -> zero vector.

        Small tables use the dense one-hot path (see DENSE_LOOKUP_MAX_ROWS);
        large tables gather with mode='clip', which keeps out-of-range ids
        (corrupt input / stale vocab) deterministic and NaN-free both under
        jit and eagerly.
        """
        tab = self._params[table]
        if self._is_dense(table):
            return _masked_one_hot(ids, tab.shape[0], tab.dtype) @ tab
        emb = self._quantized_rows(table, ids)
        if emb is None:
            emb = self._gather(tab, ids)
        return emb * (ids > 0)[:, None].astype(emb.dtype)

    def embed_sequence(self, table: str, ids: jax.Array) -> jax.Array:
        """(B, T) padded ids -> (B, T, dim) with zero rows at PAD positions."""
        emb = self._quantized_rows(table, ids)
        if emb is None:
            emb = self._gather(self._params[table], ids)
        return emb * (ids > 0)[..., None].astype(emb.dtype)

    def embed_pooled(
        self,
        table: str,
        ids: jax.Array,
        combiner: str = "mean",
    ) -> jax.Array:
        """(B, T) padded ids -> (B, dim) pooled over valid (id > 0) positions.

        Matches TF's sparse combiners (mean = sum / count of valid ids;
        all-padding rows -> zeros rather than NaN).  Small tables pool via a
        (B, R) multi-hot matmul — no (B, T, dim) intermediate, no backward
        scatter.
        """
        if self._is_dense(table):
            tab = self._params[table]
            # sum_t one_hot -> fused compare+reduce, never (B, T, R)
            multihot = jnp.sum(
                _masked_one_hot(ids, tab.shape[0], tab.dtype), axis=1
            )  # (B, R)
            total = multihot @ tab
        else:
            emb = self.embed_sequence(table, ids)  # PAD rows already zeroed
            total = jnp.sum(emb, axis=1)
        if combiner == "sum":
            return total
        count = jnp.sum((ids > 0).astype(total.dtype), axis=1, keepdims=True)
        if combiner == "mean":
            return total / jnp.maximum(count, 1.0)
        if combiner == "sqrtn":
            return total / jnp.sqrt(jnp.maximum(count, 1.0))
        raise ValueError(f"unknown combiner: {combiner!r}")


def tables_for_fields(
    field_dims: Mapping[str, int],
    field_to_vocab: Mapping[str, str],
    vocab_sizes: Mapping[str, int],
) -> dict[str, TableSpec]:
    """Build table specs from per-field dims, merging fields that share a vocab.

    Fields mapping to the same vocab name share one table (must agree on dim),
    reproducing ``fc.shared_embedding_columns`` (reference
    wide_and_deep.py:109).
    """
    specs: dict[str, TableSpec] = {}
    for field, dim in field_dims.items():
        vocab = field_to_vocab[field]
        if vocab in specs:
            if specs[vocab].dim != dim:
                raise ValueError(
                    f"fields sharing vocab {vocab!r} disagree on dim: "
                    f"{specs[vocab].dim} vs {dim}"
                )
            continue
        specs[vocab] = TableSpec(vocab, vocab_sizes[vocab], dim)
    return specs
