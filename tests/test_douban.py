"""Douban ETL + schema-driven training: the reference's ABANDONED second
dataset (douban DataGenerator.py — vocabulary/feature steps commented out,
never ran) completed end to end: raw ratings/movies CSVs -> vocab /
dataframe / TFRecords -> the standard pipeline -> GenericDNN training via
cli.main --dataset douban."""

import numpy as np
import pandas as pd
import pytest

from recalgorithm_tpu.data import pipeline
from recalgorithm_tpu.data.douban import DoubanETL
from recalgorithm_tpu.features.schema import douban_schema
from recalgorithm_tpu.features.vocab import VocabularyStore


@pytest.fixture
def raw_douban(tmp_path):
    """Tiny ratings.csv / movies.csv in the douban_moviedata_10m layout,
    with a planted user-mean + movie-quality rating signal."""
    rng = np.random.default_rng(0)
    n_users, n_movies, n_directors, n_actors = 40, 120, 18, 50
    user_mean = rng.normal(3.5, 0.6, n_users)
    movie_q = rng.normal(0.0, 0.7, n_movies)

    movies = []
    genres = ["剧情", "喜剧", "动作", "爱情", "科幻", "悬疑"]
    langs = ["汉语普通话", "英语", "日语"]
    regions = ["中国大陆", "美国", "日本"]
    for m in range(n_movies):
        movies.append(dict(
            MOVIE_ID=m,
            GENRES="/".join(sorted(set(
                rng.choice(genres, size=rng.integers(1, 3), replace=False)
            ))),
            ACTOR_IDS="|".join(f"actor{a}" for a in rng.choice(
                n_actors, size=rng.integers(1, 4), replace=False)),
            DIRECTOR_IDS="|".join(f"dir{d}" for d in rng.choice(
                n_directors, size=rng.integers(1, 3), replace=False)),
            LANGUAGES=" / ".join(rng.choice(langs, size=1)),
            REGIONS=" / ".join(rng.choice(regions, size=1)),
            # include the YEAR == 0 outlier the reference excludes
            YEAR=0 if m == 7 else int(1990 + m % 10),
        ))
    pd.DataFrame(movies).to_csv(tmp_path / "movies.csv", index=False)

    rows = []
    start = np.datetime64("2018-01-01")
    for u in range(n_users):
        n = rng.integers(30, 45)
        days = np.sort(rng.integers(0, 638, size=n))  # 2018-01 .. 2019-09
        for d in days:
            m = int(rng.integers(0, n_movies))
            r = np.clip(round(user_mean[u] + movie_q[m] + rng.normal(0, 0.7)),
                        1, 5)
            ts = start + np.timedelta64(int(d), "D")
            rows.append(dict(USER_MD5=f"u{u:03d}", MOVIE_ID=m,
                             RATING=int(r),
                             RATING_TIME=str(ts) + " 12:00:00"))
    pd.DataFrame(rows).to_csv(tmp_path / "ratings.csv", index=False)
    return tmp_path


def test_douban_etl_end_to_end(raw_douban):
    out = raw_douban
    DoubanETL(str(out) + "/", str(out) + "/").run()

    # vocabularies: per-column files, YEAR outlier excluded, min_counts hold
    vocabs = VocabularyStore.from_dir(str(out / "vocabulary"))
    assert "USER_MD5" in vocabs.vocabs and "DIRECTOR_IDS" in vocabs.vocabs
    assert "0" not in set(vocabs["YEAR"].tokens())
    assert all(t.startswith("dir") for t in vocabs["DIRECTOR_IDS"].tokens())

    train = pd.read_csv(out / "dataframe" / "train.csv")
    test = pd.read_csv(out / "dataframe" / "test.csv")
    assert len(train) > 0 and len(test) > 0
    assert (pd.to_datetime(train["RATING_TIME"]) >= "2019-01-01").all()
    assert (pd.to_datetime(train["RATING_TIME"]) < "2019-09-01").all()
    assert (pd.to_datetime(test["RATING_TIME"]) >= "2019-09-01").all()
    assert set(train["rating_ge_4"].unique()) <= {0.0, 1.0}

    # window-feature oracle: recompute one row's 360d stats from raw CSVs
    ratings = pd.read_csv(out / "ratings.csv")
    ratings["RATING_TIME"] = pd.to_datetime(ratings["RATING_TIME"])
    ratings["_day"] = ratings["RATING_TIME"].dt.normalize()
    row = train.iloc[len(train) // 2]
    d = pd.to_datetime(row["RATING_TIME"]).normalize()
    w = ratings[(ratings["USER_MD5"] == row["USER_MD5"])
                & (ratings["_day"] < d)
                & (d - ratings["_day"] <= pd.Timedelta(days=360))]
    if len(w):
        np.testing.assert_allclose(row["u_rating_360d_mean"],
                                   w["RATING"].mean(), rtol=1e-5)
        np.testing.assert_allclose(row["u_rating_360d_max"],
                                   w["RATING"].max(), rtol=1e-6)
        last = w.sort_values("RATING_TIME").iloc[-1]
        np.testing.assert_allclose(row["u_last_rating"], last["RATING"],
                                   rtol=1e-6)
        # history = last <= 20 movie ids of the window, chronological
        import ast

        hist = ast.literal_eval(row["HISTORY_MOVIES"])
        want = [str(m) for m in
                w.sort_values("RATING_TIME")["MOVIE_ID"].tolist()][-20:]
        assert hist == want

    # TFRecords parse through the STANDARD pipeline with the douban schema
    schema = douban_schema(vocabs.sizes())
    data = pipeline.load_dataset(str(out / "tfrecord" / "train.tfrecord"),
                                 schema, vocabs)
    assert data.num_examples == len(train)
    ids, lens = data.sequences["HISTORY_MOVIES"]
    assert ids.shape[1] == 20 and lens.max() <= 20
    assert set(np.unique(data.labels)) <= {0.0, 1.0}
    for name, arr in data.categorical.items():
        assert arr.min() >= 0
        assert arr.max() <= schema.vocab_sizes[schema.vocab_of(name)]


@pytest.mark.parametrize("model", ["GenericDNN", "DeepFM"])
def test_douban_cli_training(raw_douban, tmp_path_factory, model):
    """cli.main --dataset douban trains schema-driven models on the
    completed ETL's artifacts and writes a predictions.csv whose id columns
    carry the original USER_MD5 / MOVIE_ID tokens.  GenericDNN is built
    schema-first; DeepFM is a REFERENCE model whose field list derives from
    the douban schema (common.reference_or_schema_fields) — dataset support
    as a framework property, not a per-model rewrite."""
    import csv

    out = raw_douban
    DoubanETL(str(out) + "/", str(out) + "/").run()
    work = tmp_path_factory.mktemp("douban_cli")

    from recalgorithm_tpu.cli.main import main as cli_main

    final = cli_main([
        "--model", model, "--dataset", "douban",
        "--train_data", str(out / "tfrecord" / "train.tfrecord"),
        "--eval_data", str(out / "tfrecord" / "test.tfrecord"),
        "--vocabulary_dir", str(out / "vocabulary"),
        "--model_dir", str(work / "model"),
        "--predictions_csv", str(work / "predictions.csv"),
        "--train_steps", "30", "--batch_size", "64",
        "--hidden_units", "32,16",
        "--save_checkpoints_steps", "0", "--eval_throttle_secs", "0",
    ])
    assert "rating_ge_4_auc" in final
    assert "rating_ge_4_exact_auc" in final
    assert "rating_ge_4_gauc" in final

    with open(work / "predictions.csv") as f:
        rows = list(csv.DictReader(f))
    test_rows = len(pd.read_csv(out / "dataframe" / "test.csv"))
    assert len(rows) == test_rows
    vocabs = VocabularyStore.from_dir(str(out / "vocabulary"))
    known_users = set(vocabs["USER_MD5"].tokens()) | {""}
    for r in rows[:50]:
        assert r["USER_MD5"] in known_users
        assert 0.0 <= float(r["rating_ge_4_probabilities"]) <= 1.0


@pytest.mark.slow
def test_douban_synth_learnability(tmp_path):
    """Golden band for the douban path: moviedata-10m-shaped synthetic CSVs
    (data/synth_douban.py at scale 0.01, planted user x movie x director
    signal) -> completed ETL -> schema-driven GenericDNN must learn well
    clear of chance.  Measured on this seed/config: AUC ~0.72-0.84 at 300
    steps (REHEARSAL_DOUBAN.md carries the full-scale counterpart)."""
    from recalgorithm_tpu.data.synth_douban import (
        DoubanRawConfig,
        generate_douban_csvs,
    )

    generate_douban_csvs(str(tmp_path), DoubanRawConfig(scale=0.01, seed=3))
    DoubanETL(str(tmp_path) + "/", str(tmp_path) + "/").run()

    from recalgorithm_tpu.cli.main import main as cli_main

    final = cli_main([
        "--model", "GenericDNN", "--dataset", "douban",
        "--train_data", str(tmp_path / "tfrecord" / "train.tfrecord"),
        "--eval_data", str(tmp_path / "tfrecord" / "test.tfrecord"),
        "--vocabulary_dir", str(tmp_path / "vocabulary"),
        "--model_dir", str(tmp_path / "model"),
        "--train_steps", "300", "--batch_size", "256",
        "--save_checkpoints_steps", "0", "--eval_throttle_secs", "0",
        "--limit_examples", "120000",
    ])
    assert final["rating_ge_4_auc"] > 0.65, final


def test_douban_etl_resumes_from_feature_cache(raw_douban):
    """Crash after the features stage resumes with an unpickle, not a
    recompute (features/samples.pkl behind FEATURE_FILE_ALREADY)."""
    import os
    import time as _t

    out = raw_douban
    etl = DoubanETL(str(out) + "/", str(out) + "/")
    import pandas as pd_mod

    ratings, movies = etl._load(pd_mod)
    etl._generate_vocabulary(pd_mod, ratings, movies)
    etl._generate_features(pd_mod, ratings, movies)  # then "crash"
    cache = out / "features" / "samples.pkl"
    assert cache.exists()
    m_cache = os.path.getmtime(cache)
    _t.sleep(0.05)

    etl.run()  # resume completes the remaining stages
    assert (out / "tfrecord" / "TFRECORD_train_ALREADY").exists()
    assert os.path.getmtime(cache) == m_cache, "features were recomputed"

    # idempotent second run: artifacts untouched
    m_tf = os.path.getmtime(out / "tfrecord" / "train.tfrecord")
    etl.run()
    assert os.path.getmtime(out / "tfrecord" / "train.tfrecord") == m_tf
