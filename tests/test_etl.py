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


def test_etl_chunked_matches_whole(raw_dataset, tmp_path_factory):
    """Low-RAM chunk_dates mode produces the same TFRecords (same rows, any
    order within a date is fixed by construction) and the same dataframe
    contents as the all-in-RAM join."""
    whole = tmp_path_factory.mktemp("whole")
    chunked = tmp_path_factory.mktemp("chunked")
    WeChatETL(str(raw_dataset) + "/", str(whole) + "/").run()
    WeChatETL(str(raw_dataset) + "/", str(chunked) + "/",
              chunk_dates=True).run()

    for split in ("train", "test"):
        a = pd.read_csv(whole / "dataframe" / f"{split}.csv")
        b = pd.read_csv(chunked / "dataframe" / f"{split}.csv")
        # the whole join orders by raw-action order within dates 8..14;
        # the chunked join processes date-by-date — sort both for comparison
        key = ["date_", "userid", "feedid"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_like=True)

        vocabs = VocabularyStore.from_dir(str(whole / "vocabulary"))
        schema = wechat_schema(vocabs.sizes())
        da = pipeline.load_dataset(str(whole / "tfrecord" / f"{split}.tfrecord"),
                                   schema, vocabs)
        db = pipeline.load_dataset(str(chunked / "tfrecord" / f"{split}.tfrecord"),
                                   schema, vocabs)
        assert da.num_examples == db.num_examples
        np.testing.assert_allclose(np.sort(da.dense.ravel()),
                                   np.sort(db.dense.ravel()), rtol=1e-6)


def test_etl_resumes_after_crash_mid_pipeline(raw_dataset, tmp_path_factory):
    """Per-stage sentinels (reference DataGenerator.py:229-231, 352-354,
    396-398): a run that crashes AFTER the dataframe stage resumes at the
    tfrecord stage — the features come back from features/*.pkl and the
    join from the CSVs, neither recomputed (verified by mtime)."""
    import os
    import time as _t

    out = tmp_path_factory.mktemp("resume")
    etl = WeChatETL(str(raw_dataset) + "/", str(out) + "/")

    # simulated crash: run the first three stages, then die before tfrecord
    import pandas as pd_mod
    ua, fi = etl._load(pd_mod)
    etl._generate_vocabulary(pd_mod, ua, fi)
    frames = etl._generate_features(pd_mod, ua, fi)
    etl._generate_dataframe(pd_mod, ua, fi, frames)
    assert (out / "features" / "FEATURE_FILE_ALREADY").exists()
    assert (out / "dataframe" / "DATAFRAME_ALREADY").exists()
    assert not (out / "tfrecord" / "TFRECORD_train_ALREADY").exists()

    train_csv = out / "dataframe" / "train.csv"
    feat_pkl = out / "features" / "user.pkl"
    m_csv, m_pkl = os.path.getmtime(train_csv), os.path.getmtime(feat_pkl)
    _t.sleep(0.05)

    etl.run()  # resume: must complete the tfrecords without rewriting stages
    assert (out / "tfrecord" / "TFRECORD_train_ALREADY").exists()
    assert os.path.getmtime(train_csv) == m_csv, "dataframe was recomputed"
    assert os.path.getmtime(feat_pkl) == m_pkl, "features were recomputed"

    # and the resumed TFRecords parse to the dataframe's row count
    vocabs = VocabularyStore.from_dir(str(out / "vocabulary"))
    schema = wechat_schema(vocabs.sizes())
    data = pipeline.load_dataset(str(out / "tfrecord" / "train.tfrecord"),
                                 schema, vocabs)
    assert data.num_examples == len(pd.read_csv(train_csv))

    # a second full run is a no-op for every artifact
    m_tf = os.path.getmtime(out / "tfrecord" / "train.tfrecord")
    etl.run()
    assert os.path.getmtime(out / "tfrecord" / "train.tfrecord") == m_tf
