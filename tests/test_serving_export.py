"""StableHLO export round trip: serialized artifact reproduces live predictions."""

import jax
import numpy as np
import pytest

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.deepfm import DeepFM, DeepFMConfig
from recalgorithm_tpu.serving.export import export_stablehlo, load_exported


def test_export_roundtrip(tmp_path):
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=2, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=32)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jax.numpy.asarray(v) for k, v in gen.batch(32, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)

    path = str(tmp_path / "deepfm.stablehlo")
    export_stablehlo(model, variables, schema, batch_size=32, out_path=path)

    serve = load_exported(path)
    got = serve(gen.batch(32, 1))
    live, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        {k: jax.numpy.asarray(v) for k, v in gen.batch(32, 1).items()},
        train=False, mutable=["losses"],
    )
    want = jax.nn.sigmoid(live["read_comment"])
    np.testing.assert_allclose(
        np.asarray(got["read_comment"]), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_batching_predictor_concurrent(tmp_path):
    """Dynamic-batching server: concurrent single-example requests return
    the same probabilities as direct batch prediction."""
    from concurrent.futures import ThreadPoolExecutor

    from recalgorithm_tpu.serving.predictor import Predictor
    from recalgorithm_tpu.serving.server import BatchingPredictor
    import flax, json, os

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=4, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=32)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jax.numpy.asarray(v) for k, v in gen.batch(64, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)

    export_dir = str(tmp_path / "export")
    os.makedirs(export_dir)
    with open(os.path.join(export_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))
    pred = Predictor(model, export_dir)

    direct = pred.predict_batch({k: np.asarray(v) for k, v in batch.items()})
    server = BatchingPredictor(pred, max_batch_size=32, max_delay_ms=5.0)
    try:
        examples = [
            {k: np.asarray(v)[i] for k, v in batch.items()} for i in range(64)
        ]
        with ThreadPoolExecutor(max_workers=16) as ex:
            results = list(ex.map(server.predict_one, examples))
    finally:
        server.close()
    got = np.asarray([r["read_comment"] for r in results])
    np.testing.assert_allclose(got, np.asarray(direct["read_comment"]),
                               rtol=1e-4, atol=1e-5)


def test_batching_predictor_survives_malformed_request(tmp_path):
    """A bad request fails ITS future with the error; the worker thread
    survives and keeps serving later requests."""
    from recalgorithm_tpu.serving.predictor import Predictor
    from recalgorithm_tpu.serving.server import BatchingPredictor
    import flax, os

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=6, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=32)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jax.numpy.asarray(v) for k, v in gen.batch(8, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    export_dir = str(tmp_path / "export")
    os.makedirs(export_dir)
    with open(os.path.join(export_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))
    server = BatchingPredictor(Predictor(model, export_dir),
                               max_batch_size=300, max_delay_ms=1.0)
    try:
        assert server.buckets[-1] == 300  # max_batch_size always a bucket
        good = {k: np.asarray(v)[0] for k, v in batch.items()}
        bad = {"userid": np.int32(1)}  # missing every other feature
        fut = server.predict_async(bad)
        with pytest.raises(Exception):
            fut.result(timeout=30)
        # the worker is still alive and serves the next request
        out = server.predict_one(good)
        assert 0.0 <= out["read_comment"] <= 1.0
    finally:
        server.close()


def test_export_manifest(tmp_path):
    import json
    import os

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=9, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=16)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jax.numpy.asarray(v) for k, v in gen.batch(16, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, variables, schema, batch_size=16, out_path=path)
    m = json.load(open(path + ".manifest.json"))
    assert m["model"] == "DeepFM"
    assert m["batch_size"] == 16
    assert m["quantized_embeddings"] is False
    assert m["outputs"] == ["read_comment"]
    assert m["inputs"]["dense"] == {"shape": [16, 16], "dtype": "float32"}
    assert "labels" not in m["inputs"]
    assert m["artifact_bytes"] == os.path.getsize(path)
