"""Hermetic offline scorer (cli/score.py): artifact + TFRecord split ->
predictions.csv identical to direct HLOPredictor scoring."""

import csv

import jax
import jax.numpy as jnp
import numpy as np

from recalgorithm_tpu.data import pipeline
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.features.vocab import VocabularyStore
from recalgorithm_tpu.models.deepfm import DeepFM, DeepFMConfig
from recalgorithm_tpu.serving.export import export_stablehlo
from tests.test_data import _write_tiny_dataset


def test_score_cli(tmp_path):
    from recalgorithm_tpu.cli.score import main as score_main

    path, vocab_dir, _ = _write_tiny_dataset(tmp_path, n=11)
    vocabs = VocabularyStore.from_dir(str(vocab_dir))
    schema = wechat_schema(vocabs.sizes())
    cfg = DeepFMConfig(hidden_units=(16,), batch_size=4)
    model = DeepFM(config=cfg, schema=schema)
    data = pipeline.load_dataset(str(path), schema, vocabs)
    b0 = next(pipeline.batches(data, 4, num_epochs=1, shuffle=False))
    variables = model.init(
        jax.random.key(0), {k: jnp.asarray(v) for k, v in b0.items()},
        train=False,
    )
    artifact = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, variables, schema, batch_size=4, out_path=artifact)

    out_csv = str(tmp_path / "scored.csv")
    score_main(["--stablehlo", artifact, "--data", str(path),
                "--vocabulary_dir", str(vocab_dir), "--out", out_csv])

    rows = list(csv.DictReader(open(out_csv)))
    assert len(rows) == 11  # padded tail dropped, every example scored once
    # probabilities match direct artifact scoring
    from recalgorithm_tpu.serving.predictor import HLOPredictor

    want = HLOPredictor(artifact).predict(
        pipeline.batches(data, 4, num_epochs=1, shuffle=False)
    )["read_comment"]
    got = np.asarray([float(r["read_comment_probabilities"]) for r in rows])
    np.testing.assert_allclose(got, want, atol=5e-7)
    # id columns carry original string tokens
    assert rows[0]["userid"].startswith("userid_")
    assert set(rows[0]) >= {"userid", "feedid", "read_comment_probabilities"}
