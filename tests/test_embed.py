"""Embedding engine tests: combiners, PAD masking, shared tables, hashed cross."""

import jax
import jax.numpy as jnp
import numpy as np

from recalgorithm_tpu.embed.tables import EmbeddingCollection, TableSpec, tables_for_fields
from recalgorithm_tpu.embed.cross import hashed_cross
from recalgorithm_tpu.features.vocab import Vocabulary


def _collection():
    tables = {
        "feedid": TableSpec("feedid", vocab_size=10, dim=4),
        "tag": TableSpec("tag", vocab_size=5, dim=3),
    }

    coll = EmbeddingCollection(tables=tables)
    ids = jnp.asarray([1, 2, 0], jnp.int32)
    params = coll.init(jax.random.key(0), method=lambda m: m.embed_scalar("feedid", ids))
    return coll, params


def test_scalar_pad_is_zero_and_no_grad_to_row0():
    coll, params = _collection()
    ids = jnp.asarray([1, 2, 0], jnp.int32)
    out = coll.apply(params, method=lambda m: m.embed_scalar("feedid", ids))
    np.testing.assert_allclose(np.asarray(out[2]), 0.0, atol=1e-7)

    def loss(p):
        o = coll.apply(p, method=lambda m: m.embed_scalar("feedid", ids))
        return jnp.sum(o**2)

    g = jax.grad(loss)(params)
    table_grad = np.asarray(g["params"]["feedid"])
    np.testing.assert_allclose(table_grad[0], 0.0, atol=1e-7)  # PAD row untouched
    assert np.abs(table_grad[1]).sum() > 0


def test_mean_combiner_matches_numpy():
    coll, params = _collection()
    ids = jnp.asarray([[1, 2, 0, 0], [3, 0, 0, 0], [0, 0, 0, 0]], jnp.int32)
    out = np.asarray(
        coll.apply(params, method=lambda m: m.embed_pooled("feedid", ids, "mean"))
    )
    table = np.asarray(params["params"]["feedid"])
    np.testing.assert_allclose(out[0], (table[1] + table[2]) / 2, rtol=1e-5)
    np.testing.assert_allclose(out[1], table[3], rtol=1e-5)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-7)  # empty row -> zeros


def test_shared_tables_merge():
    specs = tables_for_fields(
        field_dims={"feedid": 16, "his_seq": 16, "userid": 8},
        field_to_vocab={"feedid": "feedid", "his_seq": "feedid", "userid": "userid"},
        vocab_sizes={"feedid": 100, "userid": 50},
    )
    assert set(specs) == {"feedid", "userid"}
    assert specs["feedid"].num_rows == 256  # 101 padded to ROW_ALIGN


def test_vocabulary_roundtrip(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("feedid_1\nfeedid_7\nfeedid_3\n")
    v = Vocabulary.from_file(str(p))
    assert len(v) == 3
    assert v.lookup("feedid_1") == 1
    assert v.lookup("feedid_3") == 3
    assert v.lookup("missing") == 0
    np.testing.assert_array_equal(
        v.lookup_many(["feedid_7", "nope"]), np.array([2, 0], np.int32)
    )


def test_hashed_cross_properties():
    a = jnp.asarray([3, 5, 0], jnp.int32)
    b = jnp.asarray([[1, 2, 0], [1, 0, 0], [1, 1, 1]], jnp.int32)
    out = np.asarray(hashed_cross(a, b, num_buckets=1000))
    assert out.shape == (3, 3)
    # PAD propagation: either side 0 -> 0
    assert out[0, 2] == 0 and out[1, 1] == 0 and np.all(out[2] == 0)
    # valid buckets in [1, 1000]
    valid = out[out > 0]
    assert valid.min() >= 1 and valid.max() <= 1000
    # deterministic
    out2 = np.asarray(hashed_cross(a, b, num_buckets=1000))
    np.testing.assert_array_equal(out, out2)
    # different pairs hash differently (w.h.p.)
    assert out[0, 0] != out[0, 1]


def test_dense_lookup_matches_gather():
    """Small-vocab tables use the one-hot-matmul path; it must agree with the
    gather path (values AND table gradients) for scalar and pooled lookups."""
    import recalgorithm_tpu.embed.tables as T

    tables = {"t": TableSpec("t", vocab_size=300, dim=8)}  # 512 rows -> dense
    coll = EmbeddingCollection(tables=tables)
    rng = np.random.default_rng(0)
    ids_s = jnp.asarray(rng.integers(0, 301, 64, dtype=np.int32))
    ids_p = jnp.asarray(rng.integers(0, 301, (64, 7), dtype=np.int32))
    ids_p = ids_p * (jnp.arange(7)[None, :] < 4)  # padded tail
    params = coll.init(
        jax.random.key(1), method=lambda m: m.embed_scalar("t", ids_s)
    )
    assert coll.apply(params, method=lambda m: m._is_dense("t"))

    def run(p):
        s = coll.apply(p, method=lambda m: m.embed_scalar("t", ids_s))
        pooled = {
            c: coll.apply(p, method=lambda m: m.embed_pooled("t", ids_p, c))
            for c in ("mean", "sum", "sqrtn")
        }
        return s, pooled

    def run_gather(p):
        tab = p["params"]["t"]
        s = jnp.take(tab, ids_s, axis=0) * (ids_s > 0)[:, None]
        emb = jnp.take(tab, ids_p, axis=0) * (ids_p > 0)[..., None]
        total = emb.sum(1)
        cnt = jnp.maximum((ids_p > 0).sum(1, keepdims=True).astype(total.dtype), 1.0)
        pooled = {"mean": total / cnt, "sum": total, "sqrtn": total / jnp.sqrt(cnt)}
        return s, pooled

    (s_d, p_d), (s_g, p_g) = run(params), run_gather(params)
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_g), rtol=1e-5, atol=1e-6)
    for c in p_d:
        np.testing.assert_allclose(
            np.asarray(p_d[c]), np.asarray(p_g[c]), rtol=1e-5, atol=1e-6, err_msg=c
        )

    def loss_d(p):
        s, pooled = run(p)
        return jnp.sum(s**2) + sum(jnp.sum(v**2) for v in pooled.values())

    def loss_g(p):
        s, pooled = run_gather(p)
        return jnp.sum(s**2) + sum(jnp.sum(v**2) for v in pooled.values())

    g_d = jax.grad(loss_d)(params)["params"]["t"]
    g_g = jax.grad(loss_g)(params)["params"]["t"]
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_g), rtol=1e-4, atol=1e-5)
