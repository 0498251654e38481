"""shard_map embedding exchange: forward/backward equivalence vs plain gather."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recalgorithm_tpu.embed.sharded import sharded_lookup
from recalgorithm_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _setup():
    mesh = mesh_lib.make_mesh(num_model=1)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 256, size=(64,)).astype(np.int32))
    table_s = jax.device_put(table, NamedSharding(mesh, P(("data",), None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))
    return mesh, table, ids, table_s, ids_s


def test_forward_matches_plain_gather():
    mesh, table, ids, table_s, ids_s = _setup()
    got = jax.jit(lambda t, i: sharded_lookup(t, i, mesh))(table_s, ids_s)
    want = np.asarray(table)[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    # output batch-sharded over all 8 devices
    assert len(got.sharding.device_set) == 8


def test_backward_is_scatter_add():
    mesh, table, ids, table_s, ids_s = _setup()

    def loss_sharded(t):
        out = sharded_lookup(t, ids_s, mesh)
        return jnp.sum(out * out)

    def loss_plain(t):
        out = jnp.take(t, ids, axis=0)
        return jnp.sum(out * out)

    g_sharded = jax.jit(jax.grad(loss_sharded))(table_s)
    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_plain), rtol=1e-5, atol=1e-6
    )
    # duplicate ids accumulate (scatter-ADD, not overwrite)
    dup_ids = jax.device_put(
        jnp.zeros((64,), jnp.int32) + 7, NamedSharding(mesh, P("data"))
    )
    g_dup = jax.jit(
        jax.grad(lambda t: jnp.sum(sharded_lookup(t, dup_ids, mesh)))
    )(table_s)
    np.testing.assert_allclose(np.asarray(g_dup)[7], 64.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_dup)[8], 0.0, atol=1e-7)


def test_shape_validation():
    mesh, table, ids, table_s, ids_s = _setup()
    with pytest.raises(ValueError, match="not divisible"):
        sharded_lookup(table_s[:100], ids_s, mesh)


def test_mixed_mesh_exact_grads():
    """(data=4, model=2) mesh: forward AND backward exactly match the plain
    gather — guards the replicated-output transpose bug (cotangents split
    1/model_size ways when the out_spec omits a mesh axis)."""
    mesh = mesh_lib.make_mesh(num_model=2)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 256, size=(64,)).astype(np.int32))
    table_s = jax.device_put(
        table, NamedSharding(mesh, mesh_lib.TABLE_SPEC)
    )
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))
    cot = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))

    got = jax.jit(lambda t, i: sharded_lookup(t, i, mesh))(table_s, ids_s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(table)[np.asarray(ids)], rtol=1e-6
    )

    g_sharded = jax.jit(
        jax.grad(lambda t: jnp.sum(sharded_lookup(t, ids_s, mesh) * cot))
    )(table_s)
    g_plain = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) * cot))(table)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_plain), rtol=1e-6, atol=1e-7
    )
