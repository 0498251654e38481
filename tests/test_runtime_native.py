"""Native C++ reader vs pure-Python oracle: identical output on the same file."""

import numpy as np
import pytest

from recalgorithm_tpu.data import pipeline
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.features.vocab import VocabularyStore
from tests.test_data import _write_tiny_dataset


def test_native_matches_python_oracle(tmp_path):
    loader = pytest.importorskip("recalgorithm_tpu.runtime.loader")
    path, vocab_dir, _ = _write_tiny_dataset(tmp_path, n=23)
    vocabs = VocabularyStore.from_dir(vocab_dir)
    schema = wechat_schema(vocabs.sizes())

    py = pipeline.load_tfrecord_dataset(path, schema, vocabs)
    cc = loader.read_dataset(path, schema, vocabs, verify_crc=True)

    assert cc.num_examples == py.num_examples == 23
    np.testing.assert_allclose(cc.dense, py.dense, rtol=1e-6)
    np.testing.assert_allclose(cc.labels, py.labels, rtol=1e-6)
    for name in py.categorical:
        np.testing.assert_array_equal(cc.categorical[name], py.categorical[name])
    for name in py.sequences:
        np.testing.assert_array_equal(cc.sequences[name][0], py.sequences[name][0])
        np.testing.assert_array_equal(cc.sequences[name][1], py.sequences[name][1])


def test_native_limit(tmp_path):
    loader = pytest.importorskip("recalgorithm_tpu.runtime.loader")
    path, vocab_dir, _ = _write_tiny_dataset(tmp_path, n=23)
    vocabs = VocabularyStore.from_dir(vocab_dir)
    schema = wechat_schema(vocabs.sizes())
    cc = loader.read_dataset(path, schema, vocabs, limit=5)
    assert cc.num_examples == 5


def test_permute_rows_rejects_partial_order():
    from recalgorithm_tpu.runtime.loader import permute_rows

    arr = np.arange(20, dtype=np.float32).reshape(10, 2)
    with pytest.raises(ValueError, match="full permutation"):
        permute_rows(arr, np.arange(5, dtype=np.int64))


def test_native_threaded_parse_matches_serial(tmp_path):
    """The wave-parallel parse (records fanned over threads into disjoint
    row slots) produces byte-identical output to the serial parse."""
    from recalgorithm_tpu.runtime import loader

    path, vocab_dir, _ = _write_tiny_dataset(tmp_path, n=23)
    vocabs = VocabularyStore.from_dir(str(vocab_dir))
    schema = wechat_schema(vocabs.sizes())
    serial = loader.read_dataset(str(path), schema, vocabs, n_threads=1)
    threaded = loader.read_dataset(str(path), schema, vocabs, n_threads=4)
    np.testing.assert_array_equal(serial.dense, threaded.dense)
    np.testing.assert_array_equal(serial.labels, threaded.labels)
    for k in serial.categorical:
        np.testing.assert_array_equal(serial.categorical[k],
                                      threaded.categorical[k])
    for k in serial.sequences:
        np.testing.assert_array_equal(serial.sequences[k][0],
                                      threaded.sequences[k][0])
        np.testing.assert_array_equal(serial.sequences[k][1],
                                      threaded.sequences[k][1])


def test_native_writer_byte_identical():
    """runtime/cc/tfrecord_writer.cc produces the exact bytes of the
    pure-Python encoder (data/tfrecord.py) for the ETL's record layout —
    incl. empty strings, empty sequences, and multi-threaded encode."""
    from recalgorithm_tpu.data import tfrecord
    from recalgorithm_tpu.runtime import loader

    rng = np.random.default_rng(1)
    n = 257  # odd size so thread ranges are uneven
    dense_names = ["d_a", "d_b"]
    label_names = ["l_x", "l_y", "l_z"]
    cat_names = ["userid", "feedid"]
    seq_names = ["his", "tags"]
    dense = rng.standard_normal((n, 2)).astype(np.float32)
    labels = (rng.random((n, 3)) < 0.3).astype(np.float32)
    cat_cols = [
        [f"userid_{rng.integers(50)}".encode() if rng.random() > 0.1 else b""
         for _ in range(n)],
        [f"feedid_{rng.integers(999)}".encode() for _ in range(n)],
    ]
    seq_cols = [
        [[f"feedid_{rng.integers(999)}".encode()
          for _ in range(rng.integers(0, 8))] for _ in range(n)],
        [[f"tag_{rng.integers(20)}".encode()
          for _ in range(rng.integers(0, 4))] for _ in range(n)],
    ]

    def payloads():
        for r in range(n):
            context = {}
            for i, nm in enumerate(dense_names):
                context[nm] = ("float", [float(dense[r, i])])
            for i, nm in enumerate(cat_names):
                context[nm] = ("bytes", [cat_cols[i][r]])
            for i, nm in enumerate(label_names):
                context[nm] = ("float", [float(labels[r, i])])
            fl = {nm: ("bytes", seq_cols[i][r]) for i, nm in enumerate(seq_names)}
            yield tfrecord.encode_sequence_example(context, fl)

    py_path, cc_path = "/tmp/wtest_py.tfrecord", "/tmp/wtest_cc.tfrecord"
    tfrecord.write_records(py_path, payloads())
    # chunk_rows=100 over 257 rows: 3 uneven append chunks, threaded encode
    rows = loader.write_sequence_examples(
        cc_path, dense_names, dense, cat_names, cat_cols,
        label_names, labels, seq_names, seq_cols, n_threads=3,
        chunk_rows=100)
    assert rows == n
    with open(py_path, "rb") as a, open(cc_path, "rb") as b:
        assert a.read() == b.read()


def test_etl_native_writer_matches_python(tmp_path):
    """The ETL's native fast path writes the same file as its Python twin."""
    import pandas as pd

    from recalgorithm_tpu.data.etl import WeChatETL
    from recalgorithm_tpu.features.schema import WECHAT_DENSE_NAMES, WECHAT_LABELS

    rng = np.random.default_rng(2)
    n = 64
    df = pd.DataFrame({
        **{c: rng.random(n) for c in WECHAT_DENSE_NAMES},
        **{c: rng.integers(0, 2, n).astype(float) for c in WECHAT_LABELS},
        "userid": [f"userid_{i%7}" for i in range(n)],
        "feedid": [f"feedid_{i%13}" if i % 9 else np.nan for i in range(n)],
        "device": ["device_1"] * n,
        "authorid": [f"authorid_{i%5}" for i in range(n)],
        "bgm_song_id": [f"bgm_song_id_{i%3}" for i in range(n)],
        "bgm_singer_id": [f"bgm_singer_id_{i%3}" for i in range(n)],
        "his_read_comment_7d_seq": [
            [f"feedid_{j}" for j in range(i % 5)] if i % 4 else np.nan
            for i in range(n)
        ],
        "manual_tag_list": [[f"tag_{i%6}"] for i in range(n)],
    })
    gen = WeChatETL.__new__(WeChatETL)  # writer needs no CSVs
    gen.tfrecord_dir = str(tmp_path)

    gen._write_tfrecord_native(df, str(tmp_path / "native.tfrecord"),
                               ["userid", "feedid", "device", "authorid",
                                "bgm_song_id", "bgm_singer_id"])
    # force the Python fallback by monkeying the native call
    orig = WeChatETL._write_tfrecord_native
    WeChatETL._write_tfrecord_native = lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
    try:
        gen._generate_tfrecord(pd, df, "python.tfrecord")
    finally:
        WeChatETL._write_tfrecord_native = orig
    with open(tmp_path / "native.tfrecord", "rb") as a, \
         open(tmp_path / "python.tfrecord", "rb") as b:
        assert a.read() == b.read()


def test_writer_reader_fuzz_roundtrip(tmp_path):
    """Fuzz: random WeChat-shaped data through the native WRITER then the
    native READER (verify_crc on) reproduces every value — the two C++
    components agree on framing, proto layout, and vocab semantics."""
    from recalgorithm_tpu.features.schema import (
        WECHAT_DENSE_NAMES, WECHAT_LABELS, wechat_schema)
    from recalgorithm_tpu.runtime import loader

    rng = np.random.default_rng(7)
    n = 301
    # vocab files: token per line; ids are line+1, unknown -> 0
    schema0 = wechat_schema()
    vocab_dir = tmp_path / "vocabulary"
    vocab_dir.mkdir()
    vocab_tokens = {}
    for f in schema0.categorical + schema0.sequence:
        toks = [f"{f.vocab}_{i}" for i in range(40)]
        vocab_tokens.setdefault(f.vocab, toks)
    for name, toks in vocab_tokens.items():
        (vocab_dir / f"{name}.txt").write_text("\n".join(toks) + "\n")
    vocabs = VocabularyStore.from_dir(str(vocab_dir))
    schema = wechat_schema(vocabs.sizes())

    dense = rng.standard_normal((n, len(WECHAT_DENSE_NAMES))).astype(np.float32)
    labels = (rng.random((n, len(WECHAT_LABELS))) < 0.3).astype(np.float32)
    cat_tok, seq_tok = {}, {}
    for f in schema.categorical:
        # ~10% missing (''), ~10% OOV tokens -> both must read back as id 0
        col = []
        for _ in range(n):
            r = rng.random()
            if r < 0.1:
                col.append(b"")
            elif r < 0.2:
                col.append(b"NOT_IN_VOCAB")
            else:
                col.append(f"{f.vocab}_{rng.integers(40)}".encode())
        cat_tok[f.name] = col
    for f in schema.sequence:
        seq_tok[f.name] = [
            [f"{f.vocab}_{rng.integers(40)}".encode()
             for _ in range(rng.integers(0, f.max_length + 1))]
            for _ in range(n)
        ]

    path = str(tmp_path / "fuzz.tfrecord")
    loader.write_sequence_examples(
        path, list(WECHAT_DENSE_NAMES), dense,
        [f.name for f in schema.categorical],
        [cat_tok[f.name] for f in schema.categorical],
        list(WECHAT_LABELS), labels,
        [f.name for f in schema.sequence],
        [seq_tok[f.name] for f in schema.sequence],
        chunk_rows=97,  # uneven multi-chunk
    )
    data = loader.read_dataset(path, schema, vocabs, verify_crc=True)
    assert data.num_examples == n
    np.testing.assert_allclose(data.dense, dense, rtol=1e-6)
    np.testing.assert_allclose(data.labels, labels, rtol=1e-6)
    for f in schema.categorical:
        want = vocabs[f.vocab].lookup_many(
            [t.decode() for t in cat_tok[f.name]])
        np.testing.assert_array_equal(data.categorical[f.name], want)
    for f in schema.sequence:
        ids, lens = data.sequences[f.name]
        for r in range(n):
            toks = seq_tok[f.name][r]
            assert lens[r] == len(toks)
            want = vocabs[f.vocab].lookup_many([t.decode() for t in toks])
            np.testing.assert_array_equal(ids[r, : len(toks)], want)
            np.testing.assert_array_equal(ids[r, len(toks):], 0)
