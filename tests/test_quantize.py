"""Int8 embedding quantization for serving (serving/quantize.py).

Beyond-reference capability (the reference serves f32 SavedModels only):
per-row symmetric int8 tables must (a) reconstruct within the scale/2 error
bound, (b) leave served probabilities within a tight tolerance of f32 on a
real sequence model, (c) shrink the exported StableHLO artifact (the f32
tables must be dead-code-eliminated out of it), and (d) ride the Predictor
behind a single flag.
"""

import os

import flax
import jax
import jax.numpy as jnp
import numpy as np

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.serving import quantize as qz


def _flat_keys(tree, path=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _flat_keys(v, path + (k,))
        else:
            out.append(path + (k,))
    return out


def test_quantize_table_error_bound():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((512, 16)) * rng.gamma(1.0, 2.0, (512, 1))).astype(
        np.float32
    )
    x[7] = 0.0  # all-zero row must survive (scale 1.0, exact)
    q, scale = qz.quantize_table(x)
    assert q.dtype == np.int8 and scale.shape == (512, 1)
    dq = q.astype(np.float32) * scale
    err = np.abs(dq - x)
    assert np.all(err <= scale / 2 + 1e-7)
    np.testing.assert_array_equal(dq[7], 0.0)


def test_quantize_dim1_exact():
    # FM first-order weight tables are (R, 1): per-row absmax scaling makes
    # int8 reconstruction exact (q = +-127, dq = absmax = |x|)
    x = np.random.default_rng(1).standard_normal((256, 1)).astype(np.float32)
    q, scale = qz.quantize_table(x)
    np.testing.assert_allclose(q.astype(np.float32) * scale, x, rtol=1e-6)


def _din_fixture(batch_size=64):
    from recalgorithm_tpu.models.din import DIN, DINConfig

    # vocab_scale 0.05 puts feedid (5.3k rows) on the gather path where
    # quantization applies; the small tables stay on the dense f32 path
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=11, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(batch_size=batch_size, hidden_units=(32, 16))
    model = DIN(config=cfg, schema=schema)
    batch = {k: jnp.asarray(v) for k, v in gen.batch(batch_size, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    return gen, schema, model, batch, variables


def test_quantized_model_probs_close():
    gen, schema, model, batch, variables = _din_fixture()
    params = variables["params"]
    qtables = qz.build_qtables(params)
    # the shared feedid table (scalar target + behaviour sequence) quantized
    names = {p[-1] for p in _flat_keys(qtables)}
    assert any(k.startswith("feedid") and k.endswith("__q") for k in names), names

    def probs(collections):
        logits, _ = model.apply(
            collections, batch, train=False, mutable=["losses"]
        )
        return np.asarray(jax.nn.sigmoid(logits["read_comment"]))

    base = {"params": params, "batch_stats": variables.get("batch_stats", {})}
    p_f32 = probs(base)
    p_int8 = probs({**base, "qtables": qtables,
                    "params": qz.strip_quantized(params, qtables)})
    assert not np.array_equal(p_f32, p_int8), "quantized path not taken"
    assert np.max(np.abs(p_f32 - p_int8)) < 0.02, np.max(np.abs(p_f32 - p_int8))


def test_quantized_export_smaller_and_close(tmp_path):
    # W&D carries the 100k-bucket hashed-cross table -> the f32 artifact is
    # table-dominated and the quantized one must be much smaller
    from recalgorithm_tpu.models.wide_and_deep import WideAndDeep, WideAndDeepConfig
    from recalgorithm_tpu.serving.export import export_stablehlo, load_exported

    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=3, vocab_scale=0.05))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = WideAndDeepConfig(batch_size=32, hidden_units=(16,))
    model = WideAndDeep(config=cfg, schema=schema)
    batch = {k: jnp.asarray(v) for k, v in gen.batch(32, 0).items()}
    variables = model.init(jax.random.key(0), batch, train=False)
    # give the zero-init wide table real values so quantization is exercised
    wide = variables["params"]["wide_embed_w"]
    wide[schema.cross[0].name] = jnp.asarray(
        np.random.default_rng(5).standard_normal(
            wide[schema.cross[0].name].shape
        ).astype(np.float32)
    )

    f32_path = str(tmp_path / "wd_f32.stablehlo")
    q_path = str(tmp_path / "wd_int8.stablehlo")
    export_stablehlo(model, variables, schema, batch_size=32, out_path=f32_path)
    export_stablehlo(model, variables, schema, batch_size=32, out_path=q_path,
                     quantize_embeddings=True)
    f32_size = os.path.getsize(f32_path)
    q_size = os.path.getsize(q_path)
    assert q_size < 0.45 * f32_size, (f32_size, q_size)

    test_batch = gen.batch(32, 1)
    p_f32 = np.asarray(load_exported(f32_path)(test_batch)["read_comment"])
    p_int8 = np.asarray(load_exported(q_path)(test_batch)["read_comment"])
    assert np.max(np.abs(p_f32 - p_int8)) < 0.02


def test_predictor_quantize_flag(tmp_path):
    from recalgorithm_tpu.serving.predictor import Predictor

    gen, schema, model, batch, variables = _din_fixture(batch_size=16)
    export_dir = str(tmp_path / "export")
    os.makedirs(export_dir)
    with open(os.path.join(export_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))

    host = {k: np.asarray(v) for k, v in batch.items()}
    p_f32 = Predictor(model, export_dir).predict_batch(host)["read_comment"]
    qpred = Predictor(model, export_dir, quantize=True)
    assert qpred.qtables, "no tables were quantized"
    p_int8 = qpred.predict_batch(host)["read_comment"]
    assert np.max(np.abs(p_f32 - p_int8)) < 0.02
