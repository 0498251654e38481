"""ETL tests: raw CSVs -> vocab/dataframe/tfrecord, consumed by the pipeline."""

import numpy as np
import pandas as pd
import pytest

from recalgorithm_tpu.data import pipeline
from recalgorithm_tpu.data.etl import WeChatETL
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.features.vocab import VocabularyStore


@pytest.fixture
def raw_dataset(tmp_path):
    """Tiny raw user_action.csv / feed_info.csv in the competition layout."""
    rng = np.random.default_rng(0)
    n_users, n_feeds, n_authors = 6, 12, 4
    rows = []
    for date in range(1, 15):
        for _ in range(30):
            u = rng.integers(0, n_users)
            f = rng.integers(0, n_feeds)
            acts = (rng.random(7) < 0.25).astype(int)
            rows.append(
                dict(
                    userid=u, feedid=f, date_=date,
                    device=int(rng.integers(1, 3)),
                    read_comment=acts[0], like=acts[1], click_avatar=acts[2],
                    forward=acts[3], comment=acts[4], follow=acts[5],
                    favorite=acts[6],
                )
            )
    pd.DataFrame(rows).to_csv(tmp_path / "user_action.csv", index=False)

    feeds = []
    for f in range(n_feeds):
        feeds.append(
            dict(
                feedid=f,
                authorid=int(f % n_authors),
                videoplayseconds=float(rng.integers(5, 60)),
                bgm_song_id=(np.nan if f % 5 == 0 else int(f % 7)),
                bgm_singer_id=(np.nan if f % 4 == 0 else int(f % 3)),
                manual_tag_list=(np.nan if f % 6 == 0 else ";".join(
                    str(t) for t in rng.choice(9, size=rng.integers(1, 4),
                                               replace=False)
                )),
            )
        )
    pd.DataFrame(feeds).to_csv(tmp_path / "feed_info.csv", index=False)
    return tmp_path


def test_etl_end_to_end(raw_dataset):
    out = raw_dataset
    WeChatETL(str(raw_dataset) + "/", str(out) + "/").run()

    # vocabulary files exist with prefixed tokens
    vocabs = VocabularyStore.from_dir(str(out / "vocabulary"))
    assert "userid" in vocabs.vocabs and "manual_tag_id" in vocabs.vocabs
    assert all(t.startswith("feedid_") for t in vocabs["feedid"].tokens())
    assert len(vocabs["device"]) == 2

    # dataframes split by date
    train = pd.read_csv(out / "dataframe" / "train.csv")
    test = pd.read_csv(out / "dataframe" / "test.csv")
    assert set(train["date_"].unique()) <= set(range(8, 14))
    assert set(test["date_"].unique()) == {14}
    # dense features are log1p'd and NaN-free
    for col in ("videoplayseconds", "u_read_comment_7d_sum",
                "c_user_author_read_comment_7d_sum"):
        assert train[col].notna().all()
        assert (train[col] >= 0).all()

    # tfrecords parse through the standard pipeline
    schema = wechat_schema(vocabs.sizes())
    data = pipeline.load_tfrecord_dataset(
        str(out / "tfrecord" / "train.tfrecord"), schema, vocabs
    )
    assert data.num_examples == len(train)
    # every categorical id within table bounds; sequence lengths <= 50
    for name, arr in data.categorical.items():
        vocab = schema.vocab_of(name)
        assert arr.max() <= schema.vocab_sizes[vocab]
        assert arr.min() >= 0
    ids, lens = data.sequences["his_read_comment_7d_seq"]
    assert lens.max() <= 50
    # labels binary
    assert set(np.unique(data.labels)) <= {0.0, 1.0}

    # windowed feature sanity: user u's u_read_comment_7d_sum at date d equals
    # the raw count in [d-7, d)
    ua = pd.read_csv(raw_dataset / "user_action.csv")
    row = train.iloc[0]
    d = row["date_"]
    uid = int(row["userid"].split("_")[1])
    want = ua[
        (ua.userid == uid) & (ua.date_ >= d - 7) & (ua.date_ < d)
    ]["read_comment"].sum()
    np.testing.assert_allclose(row["u_read_comment_7d_sum"], np.log1p(want),
                               rtol=1e-6)


def test_etl_idempotent_vocab(raw_dataset):
    etl = WeChatETL(str(raw_dataset) + "/", str(raw_dataset) + "/")
    etl.run()
    before = (raw_dataset / "vocabulary" / "userid.txt").read_text()
    etl.run()  # sentinel short-circuits vocab regeneration
    after = (raw_dataset / "vocabulary" / "userid.txt").read_text()
    assert before == after


def test_etl_to_cli_training(raw_dataset, tmp_path_factory):
    """The full reference workflow: raw CSVs -> ETL -> TFRecords -> CLI
    training (real-data mode) -> final eval + predictions.csv whose id
    columns carry the ORIGINAL prefixed tokens (inverse-vocab round trip)."""
    import csv

    out = raw_dataset
    WeChatETL(str(raw_dataset) + "/", str(out) + "/").run()
    work = tmp_path_factory.mktemp("cli")
    pred_csv = work / "predictions.csv"

    from recalgorithm_tpu.cli.main import main as cli_main

    final = cli_main([
        "--model", "DeepCrossing",
        "--train_data", str(out / "tfrecord" / "train.tfrecord"),
        "--eval_data", str(out / "tfrecord" / "test.tfrecord"),
        "--vocabulary_dir", str(out / "vocabulary"),
        "--model_dir", str(work / "model"),
        "--predictions_csv", str(pred_csv),
        "--train_steps", "6", "--batch_size", "32",
        "--residual_internal_dim", "16",
        "--save_checkpoints_steps", "0", "--eval_throttle_secs", "0",
    ])
    assert "read_comment_auc" in final
    assert "read_comment_exact_auc" in final

    with open(pred_csv) as f:
        rows = list(csv.DictReader(f))
    assert rows, "empty predictions.csv"
    vocabs = VocabularyStore.from_dir(str(out / "vocabulary"))
    known_users = set(vocabs["userid"].tokens()) | {""}
    known_feeds = set(vocabs["feedid"].tokens()) | {""}
    for r in rows:
        # original prefixed string tokens, straight-joinable with test.csv
        assert r["userid"] in known_users, r["userid"]
        assert r["feedid"] in known_feeds, r["feedid"]
        assert r["userid"] == "" or r["userid"].startswith("userid_")
        assert 0.0 <= float(r["read_comment_probabilities"]) <= 1.0
