"""Hand-written sharded embedding lookup: shard_map + pinned XLA collectives.

The default path lets pjit's SPMD partitioner derive collectives from the
row-sharded table annotation (parallel/mesh.py).  This module is the explicit
version — the classic recommender exchange, written with `jax.shard_map` so
the collective schedule is pinned rather than partitioner-derived:

  forward:  all_gather(local batch ids)             # tiny: B x int32
            local_gather(table_shard, global ids)   # rows outside the shard -> 0
            psum_scatter(partial embeddings)        # (B, K) summed across shards,
                                                    # scattered back to (B/D, K)
  backward: all_gather(output cotangents)
            mask rows to the local range, scatter-add into the table shard
            (the embedding-gradient "segment-sum scatter" — touched rows only,
            never densified to (V, K))

Because every row lives on exactly one shard, the psum_scatter sum has a
single non-zero contribution per row — it is an all-to-all in disguise, but
expressed through collectives XLA schedules optimally on ICI rings.

Shapes are static throughout: no sorting, no unique(), no dynamic gather
sizes — the TPU-friendly formulation of a sparse exchange.

Scope: tables sharded over ONE mesh axis (the batch axis, covering the whole
slice when the mesh is pure-DP — the default).  Mixed (data x model) table
sharding stays on the auto-partitioner path.

Numerical contract: identical to a replicated ``table[ids]`` gather; PAD/OOV
masking stays with the caller (embed/tables.py semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lookup_core(table_shard, ids_global, axis_name):
    """Per-shard body: table_shard (V/D, K), ids_global (B,) -> (B/D, K)."""
    rows = table_shard.shape[0]
    base = jax.lax.axis_index(axis_name) * rows
    local = ids_global - base
    in_range = (local >= 0) & (local < rows)
    emb = jnp.take(table_shard, jnp.clip(local, 0, rows - 1), axis=0)
    emb = emb * in_range[:, None].astype(emb.dtype)  # (B, K) partial result
    # each row is owned by exactly one shard -> the sum IS the exchange
    return jax.lax.psum_scatter(emb, axis_name, scatter_dimension=0, tiled=True)


def _core_fwd(table_shard, ids_global, axis_name):
    out = _lookup_core(table_shard, ids_global, axis_name)
    return out, (tuple(table_shard.shape), ids_global)


def _core_bwd(axis_name, res, g):
    shard_shape, ids_global = res
    rows = shard_shape[0]
    g_full = jax.lax.all_gather(g, axis_name, axis=0, tiled=True)  # (B, K)
    base = jax.lax.axis_index(axis_name) * rows
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
    axis: str = "data",
) -> jax.Array:
    """Row-sharded gather: ids (B,) int32 -> (B, K) with the exchange on ICI.

    ``table`` sharded P(axis, None) with rows divisible by the axis size
    (guaranteed by TableSpec's ROW_ALIGN padding); ``ids`` and the output
    sharded P(axis) on the batch dimension.
    """
    if table.shape[0] % mesh.shape[axis]:
        raise ValueError(
            f"table rows {table.shape[0]} not divisible by mesh axis "
            f"{axis}={mesh.shape[axis]}"
        )
    if ids.shape[0] % mesh.shape[axis]:
        raise ValueError(
            f"batch {ids.shape[0]} not divisible by mesh axis "
            f"{axis}={mesh.shape[axis]}"
        )

    def inner(table_shard, ids_local):
        ids_global = jax.lax.all_gather(ids_local, axis, axis=0, tiled=True)
        return _lookup_core(table_shard, ids_global, axis)

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(table, ids)
