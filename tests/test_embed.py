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
