"""Hand-written sharded embedding lookup: shard_map + pinned XLA collectives.

The default path lets pjit's SPMD partitioner derive collectives from the
row-sharded table annotation (parallel/mesh.py).  This module is the explicit
version — the classic recommender exchange, written with `jax.shard_map` so
the collective schedule is pinned rather than partitioner-derived:

  forward:  all_gather(local batch ids over the batch axis)   # tiny: B x int32
            local_gather(table_shard, global ids)   # rows outside the shard -> 0
            psum_scatter(partials over ALL table axes)  # (B, K) summed across
                                                        # shards, scattered to
                                                        # (B/D_total, K)
  backward: all_gather(output cotangents over the table axes)
            mask rows to the local range, scatter-add into the table shard
            (the embedding-gradient "segment-sum scatter" — touched rows only,
            never densified to (V, K))

The shard_map output is left sharded over the *full* table-axes tuple (the
batch dimension scattered over every shard); the consumer's resharding back
to the plain batch sharding is partitioner-inserted.  Keeping the body free
of replicated outputs is what makes the transpose exact: an out_spec that
omits a mesh axis is an implicit replication whose cotangent shard_map
splits 1/axis_size ways under check_vma=False — measured as exactly-halved
embedding grads on a (data=4, model=2) mesh before this formulation.

Because every row lives on exactly one shard, the psum_scatter sum has a
single non-zero contribution per row — it is an all-to-all in disguise, but
expressed through collectives XLA schedules optimally on ICI rings.

Shapes are static throughout: no sorting, no unique(), no dynamic gather
sizes — the TPU-friendly formulation of a sparse exchange.

Table sharding matches parallel/mesh.py's TABLE_SPEC exactly: rows sharded
over the *flattened* (data, model) mesh (maximum HBM headroom), while the
batch is sharded over ``data`` only.  The psum_scatter therefore rides the
full mesh and the trailing all_gather only the ``model`` axis.  Pure-DP
meshes (model=1) degenerate to the classic reduce-scatter exchange.

Numerical contract: identical to a replicated ``table[ids]`` gather for ids
in [0, rows); out-of-range ids yield zero rows (the caller masks id 0 —
embed/tables.py semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

AxisNames = tuple[str, ...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lookup_core(table_shard, ids_global, table_axes: AxisNames):
    """Per-shard body: table_shard (V/D, K), ids_global (B,) -> (B/D, K)."""
    rows = table_shard.shape[0]
    base = jax.lax.axis_index(table_axes) * rows
    local = ids_global - base
    in_range = (local >= 0) & (local < rows)
    emb = jnp.take(table_shard, jnp.clip(local, 0, rows - 1), axis=0)
    emb = emb * in_range[:, None].astype(emb.dtype)  # (B, K) partial result
    # each row is owned by exactly one shard -> the sum IS the exchange
    return jax.lax.psum_scatter(
        emb, table_axes, scatter_dimension=0, tiled=True
    )  # (B/D_total, K)


def _core_fwd(table_shard, ids_global, table_axes):
    out = _lookup_core(table_shard, ids_global, table_axes)
    return out, (tuple(table_shard.shape), ids_global)


def _core_bwd(table_axes, res, g):
    shard_shape, ids_global = res
    rows = shard_shape[0]
    # g: (B/D, K) shard of the output cotangent, in table_axes-major order —
    # the exact transpose of the forward psum_scatter
    g_full = jax.lax.all_gather(g, table_axes, axis=0, tiled=True)  # (B, K)
    base = jax.lax.axis_index(table_axes) * rows
    local = ids_global - base
    in_range = (local >= 0) & (local < rows)
    contrib = g_full * in_range[:, None].astype(g_full.dtype)
    dtable = jnp.zeros(shard_shape, g_full.dtype).at[
        jnp.clip(local, 0, rows - 1)
    ].add(contrib)
    return (dtable, None)


_lookup_core.defvjp(_core_fwd, _core_bwd)


def sharded_lookup(
    table: jax.Array,
    ids: jax.Array,
    mesh: Mesh,
    table_axes: AxisNames | str = ("data", "model"),
    batch_axis: str = "data",
) -> jax.Array:
    """Row-sharded gather: ids (B,) int32 -> (B, K) with the exchange on ICI.

    ``table`` sharded P(table_axes, None) with rows divisible by the product
    of those axis sizes (guaranteed by TableSpec's ROW_ALIGN padding);
    ``ids`` and the output sharded P(batch_axis) on the batch dimension.
    ``batch_axis`` must be one of ``table_axes``.
    """
    if isinstance(table_axes, str):
        table_axes = (table_axes,)
    n_shards = 1
    for a in table_axes:
        n_shards *= mesh.shape[a]
    if batch_axis not in table_axes:
        raise ValueError(f"batch axis {batch_axis!r} not in {table_axes}")
    if table.shape[0] % n_shards:
        raise ValueError(
            f"table rows {table.shape[0]} not divisible by shard count "
            f"{n_shards} (mesh axes {table_axes})"
        )
    if ids.shape[0] % n_shards:
        raise ValueError(
            f"batch {ids.shape[0]} not divisible by shard count {n_shards}"
        )

    def inner(table_shard, ids_local):
        ids_global = jax.lax.all_gather(ids_local, batch_axis, axis=0, tiled=True)
        return _lookup_core(table_shard, ids_global, table_axes)

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(table_axes, None), P(batch_axis)),
        out_specs=P(table_axes),
        check_vma=False,
    )(table, ids)
