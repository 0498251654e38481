"""HTTP serving CLI (cli/serve.py): request coercion, server round trip,
parity with direct prediction, bad-request isolation."""

import argparse
import json
import os
import threading
import urllib.request

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.deepfm import DeepFM, DeepFMConfig


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=32)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jnp.asarray(v) for k, v in gen.batch(32, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    export_dir = str(tmp / "export")
    os.makedirs(export_dir)
    with open(os.path.join(export_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))

    from recalgorithm_tpu.cli.serve import build_server

    args = argparse.Namespace(
        model="DeepFM", model_dir=str(tmp), export_dir=export_dir,
        vocabulary_dir=None, synthetic_vocab_scale=0.002, quantize=False,
        host="127.0.0.1", port=0, max_batch_size=32, max_delay_ms=1.0,
        hidden_units=(16,), batch_size=32, stablehlo=None,
    )
    httpd, batchers = build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, gen, schema, model, variables
    httpd.shutdown()
    for b in batchers.values():
        b.close()


def _post(url, payload, timeout=60, path="/predict"):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    url = served[0]
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert r.status == 200


def test_predict_matches_direct(served):
    url, gen, schema, model, variables = served
    hb = gen.batch(8, 3)
    # direct forward on row 0
    logits, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        {k: jnp.asarray(v) for k, v in hb.items()}, train=False,
        mutable=["losses"],
    )
    want = float(jax.nn.sigmoid(logits["read_comment"])[0])

    payload = {
        "dense": np.asarray(hb["dense"])[0].tolist(),
        **{f.name: int(np.asarray(hb[f.name])[0]) for f in schema.categorical},
        **{f.name: np.asarray(hb[f.name])[0][
               : int(np.asarray(hb[f.name + "_len"])[0])].tolist()
           for f in schema.sequence},
    }
    status, out = _post(url, payload)
    assert status == 200, out
    got = out["predictions"]["read_comment"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_predict_defaults_and_bad_request(served):
    url = served[0]
    status, out = _post(url, {})  # all-PAD example is valid
    assert status == 200 and 0.0 <= out["predictions"]["read_comment"] <= 1.0
    # string token without a vocabulary -> clean 400, server stays up
    status, out = _post(url, {"userid": "userid_123"})
    assert status == 400 and "error" in out
    status, _ = _post(url, {})
    assert status == 200


def test_make_example_coercion():
    from recalgorithm_tpu.cli.serve import make_example

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=1, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    seq = schema.sequence[0]
    ex = make_example(schema, {
        "userid": 7,
        seq.name: list(range(1, seq.max_length + 10)),  # over-long: truncated
        "videoplayseconds": 3.5,
    })
    assert ex["userid"] == 7
    assert ex[seq.name].shape == (seq.max_length,)
    assert int(ex[seq.name + "_len"]) == seq.max_length
    assert ex["dense"][0] == np.float32(3.5)
    assert ex["dense"].shape == (len(schema.dense),)


def test_metrics_endpoint(served):
    url = served[0]
    _post(url, {})  # ensure at least one served request
    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1 and m["batches"] >= 1
    assert m["mean_batch_size"] >= 1.0
    assert "batch_latency_ms_p50" in m


def test_serve_cli_sigterm_graceful(tmp_path):
    """SIGTERM to the real server process drains and exits 0."""
    import signal
    import subprocess
    import sys
    import time

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=32)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jnp.asarray(v) for k, v in gen.batch(16, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    export_dir = str(tmp_path / "export")
    os.makedirs(export_dir)
    with open(os.path.join(export_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))

    import socket
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    proc = subprocess.Popen(
        [sys.executable, "-m", "recalgorithm_tpu.cli.serve",
         "--model", "DeepFM", "--export_dir", export_dir,
         "--synthetic_vocab_scale", "0.002", "--port", str(port),
         "--hidden_units", "16", "--batch_size", "32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.time() + 300
        up = False
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                    up = r.status == 200
                    break
            except Exception:
                time.sleep(1.0)
        assert up, "server never came up"
        status, out = _post(f"http://127.0.0.1:{port}", {})
        assert status == 200
        proc.send_signal(signal.SIGTERM)
        stdout, stderr = proc.communicate(timeout=120)
        assert proc.returncode == 0, stderr[-500:]
        assert "shutdown:" in stdout, stdout[-300:]
    finally:
        if proc.poll() is None:
            proc.kill()


def test_stablehlo_hermetic_serving(tmp_path):
    """HLOPredictor serves the exported artifact with no model code:
    same probabilities as the live model, through the dynamic batcher."""
    from recalgorithm_tpu.serving.export import export_stablehlo
    from recalgorithm_tpu.serving.predictor import HLOPredictor
    from recalgorithm_tpu.serving.server import BatchingPredictor

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=8, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=16)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jnp.asarray(v) for k, v in gen.batch(16, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, variables, schema, batch_size=16, out_path=path)

    pred = HLOPredictor(path)
    assert pred.batch_size == 16 and pred.tasks == ["read_comment"]
    hb = gen.batch(10, 3)  # fewer rows than baked: pad + slice
    got = pred.predict_batch(hb)["read_comment"]
    assert got.shape == (10,)
    logits, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        {k: jnp.asarray(v) for k, v in hb.items()}, train=False,
        mutable=["losses"],
    )
    np.testing.assert_allclose(
        got, np.asarray(jax.nn.sigmoid(logits["read_comment"]))[:10],
        rtol=1e-4, atol=1e-6)

    # over-baked batch is a clean error
    with pytest.raises(ValueError, match="exceeds"):
        pred.predict_batch(gen.batch(32, 1))

    # and it rides the dynamic batcher
    server = BatchingPredictor(pred, max_batch_size=16, max_delay_ms=1.0,
                               buckets=(16,))
    try:
        one = {k: np.asarray(v)[0] for k, v in hb.items()}
        out = server.predict_one(one)
        np.testing.assert_allclose(out["read_comment"], got[0], rtol=1e-4)
    finally:
        server.close()


def test_multi_model_serving(tmp_path):
    """Several StableHLO artifacts behind one server, routed by name
    (TF-Serving multi-model config parity)."""
    from recalgorithm_tpu.cli.serve import build_server
    from recalgorithm_tpu.serving.export import export_stablehlo

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=8, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    batch = {k: jnp.asarray(v) for k, v in gen.batch(8, 0).items()}
    paths = {}
    for name, seed in (("a", 0), ("b", 1)):
        cfg = DeepFMConfig(hidden_units=(16,), batch_size=8)
        model = DeepFM(config=cfg, schema=schema)
        variables = model.init(jax.random.key(seed), batch, train=False)
        paths[name] = str(tmp_path / f"{name}.stablehlo")
        export_stablehlo(model, variables, schema, batch_size=8,
                         out_path=paths[name])

    args = argparse.Namespace(
        model=None, model_dir=str(tmp_path), export_dir=None,
        vocabulary_dir=None, synthetic_vocab_scale=0.002, quantize=False,
        host="127.0.0.1", port=0, max_batch_size=8, max_delay_ms=1.0,
        stablehlo=[f"a={paths['a']}", f"b={paths['b']}"],
    )
    httpd, batchers = build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        sa, oa = _post(url, {"userid": 3}, path="/predict/a")
        sb, ob = _post(url, {"userid": 3}, path="/predict/b")
        assert sa == 200 and sb == 200
        # different params -> different probabilities
        assert oa["predictions"]["read_comment"] != ob["predictions"]["read_comment"]
        # bare /predict is ambiguous with two models
        s_amb, o_amb = _post(url, {})
        assert s_amb == 404 and "several models" in o_amb["error"]
        # unknown name
        s_unk, _ = _post(url, {}, path="/predict/zzz")
        assert s_unk == 404
        # per-model metrics
        with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
            m = json.loads(r.read())
        assert set(m) == {"a", "b"} and m["a"]["requests"] >= 1
    finally:
        httpd.shutdown()
        for b in batchers.values():
            b.close()


def test_hlo_predictor_offline_scoring(tmp_path):
    """HLOPredictor.predict scores a batch iterator (incl. a padded tail)
    identically to per-batch calls."""
    from recalgorithm_tpu.serving.export import export_stablehlo
    from recalgorithm_tpu.serving.predictor import HLOPredictor

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=8, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=8)
    model = DeepFM(config=cfg, schema=schema)
    batch = {k: jnp.asarray(v) for k, v in gen.batch(8, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, variables, schema, batch_size=8, out_path=path)

    pred = HLOPredictor(path)
    full = gen.batch(8, 1)
    tail = {k: np.asarray(v)[:5] for k, v in gen.batch(8, 2).items()}
    tail["_weights"] = np.r_[np.ones(5, np.float32)]
    out = pred.predict([full, tail])["read_comment"]
    assert out.shape == (13,)
    np.testing.assert_allclose(
        out[:8], pred.predict_batch(full)["read_comment"], rtol=1e-6)


def test_make_example_rejects_malformed(served):
    """Malformed feature values become clean 400s, never 500s or hangs."""
    url = served[0]
    for bad in (
        {"dense": [1.0] * 99},              # oversized dense vector
        {"userid": [1, 2]},                  # list where scalar expected
        {"his_read_comment_7d_seq": "abc"},  # string where list expected
        {"userid": None},
    ):
        status, out = _post(url, bad)
        assert status == 400, (bad, status, out)
        assert "error" in out
    # server still healthy afterwards
    status, _ = _post(url, {})
    assert status == 200
