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
