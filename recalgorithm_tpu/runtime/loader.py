"""ctypes bindings for the native TFRecord/SequenceExample reader.

Builds runtime/cc/tfrecord_reader.cc on first use (g++ -O3, cached next to
the source) and exposes `read_dataset(path, schema, vocabs)` returning the
same DatasetArrays as the pure-Python pipeline loader — drop-in, ~40x faster
on the WeChat train split.  Falls back to raising ImportError if no compiler
is available; callers (data/pipeline.py users) can then use the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from recalgorithm_tpu.data.pipeline import DatasetArrays
from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.features.vocab import VocabularyStore

_CC_DIR = os.path.join(os.path.dirname(__file__), "cc")
_SRC = os.path.join(_CC_DIR, "tfrecord_reader.cc")
_SO = os.path.join(_CC_DIR, "libtfrecord_reader.so")
_SRC_W = os.path.join(_CC_DIR, "tfrecord_writer.cc")
_SO_W = os.path.join(_CC_DIR, "libtfrecord_writer.so")
_lock = threading.Lock()
_lib = None
_libw = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", _SO, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.reader_create.restype = ctypes.c_void_p
        lib.reader_destroy.argtypes = [ctypes.c_void_p]
        lib.reader_add_dense.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.reader_add_label.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.reader_add_categorical.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.reader_add_sequence.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.reader_read_file.restype = ctypes.c_int64
        lib.reader_read_file.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        lib.permute_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
        ]
        _lib = lib
        return lib


def _load_writer() -> ctypes.CDLL:
    global _libw
    with _lock:
        if _libw is not None:
            return _libw
        if (not os.path.exists(_SO_W)
                or os.path.getmtime(_SO_W) < os.path.getmtime(_SRC_W)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 "-o", _SO_W, _SRC_W],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO_W)
        lib.write_sequence_examples.restype = ctypes.c_int64
        lib.write_sequence_examples.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32,
        ]
        _libw = lib
        return lib


def write_sequence_examples(
    path: str,
    dense_names: list[str],
    dense: "np.ndarray",        # (N, n_dense) f32
    cat_names: list[str],
    cat_cols: list[list[bytes]],   # per field, N token-bytes ('' for missing)
    label_names: list[str],
    labels: "np.ndarray",       # (N, n_labels) f32
    seq_names: list[str],
    seq_cols: list[list[list[bytes]]],  # per field, N lists of token-bytes
    n_threads: int = 0,
    chunk_rows: int = 200_000,
    append: bool = False,
) -> int:
    """Native SequenceExample TFRecord writer (runtime/cc/tfrecord_writer.cc).

    Byte-identical to data/tfrecord.encode_sequence_example + write_records
    with context entries ordered (dense, categorical, labels) — the
    data/etl.py layout.  The file is streamed in ``chunk_rows`` chunks
    (marshal + parallel proto-encode + append per chunk) so peak RAM is
    O(chunk), not O(split).  Returns rows written; raises on failure.
    """
    lib = _load_writer()
    n_rows = int(dense.shape[0]) if len(dense_names) else len(labels)
    dense = np.ascontiguousarray(dense, np.float32)
    labels = np.ascontiguousarray(labels, np.float32)
    # fail loudly in Python: a short column would silently truncate via zip
    # and hand uninitialised offset arrays to the native encoder (OOB reads)
    for kind, names, cols in (("cat", cat_names, cat_cols),
                              ("seq", seq_names, seq_cols)):
        if len(names) != len(cols):
            raise ValueError(f"{kind}: {len(names)} names vs {len(cols)} columns")
        for name, col in zip(names, cols):
            if len(col) != n_rows:
                raise ValueError(
                    f"{kind} column {name!r} has {len(col)} rows, expected "
                    f"{n_rows}")
    if len(label_names) and labels.shape[0] != n_rows:
        raise ValueError(
            f"labels have {labels.shape[0]} rows, expected {n_rows}")
    as_i64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    as_f32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    done = 0
    while done < n_rows or n_rows == 0:
        lo, hi = done, min(done + max(chunk_rows, 1), n_rows)
        n_chunk = hi - lo

        # categorical tokens, row-major by (row, field)
        flat_cats: list[bytes] = []
        for row_toks in zip(*(c[lo:hi] for c in cat_cols)) if cat_cols else ():
            flat_cats.extend(row_toks)
        cat_lens = np.fromiter(
            (len(t) for t in flat_cats), np.int64, len(flat_cats))
        cat_offsets = np.zeros(len(flat_cats) + 1, np.int64)
        np.cumsum(cat_lens, out=cat_offsets[1:])
        cat_blob = b"".join(flat_cats)

        # sequence tokens, row-major by (row, field, step)
        counts = np.empty(n_chunk * len(seq_cols) if seq_cols else 0, np.int64)
        flat_seq: list[bytes] = []
        i = 0
        for row_lists in zip(*(c[lo:hi] for c in seq_cols)) if seq_cols else ():
            for toks in row_lists:
                counts[i] = len(toks)
                i += 1
                flat_seq.extend(toks)
        row_offsets = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=row_offsets[1:])
        tok_lens = np.fromiter(
            (len(t) for t in flat_seq), np.int64, len(flat_seq))
        tok_offsets = np.zeros(len(flat_seq) + 1, np.int64)
        np.cumsum(tok_lens, out=tok_offsets[1:])
        seq_blob = b"".join(flat_seq)

        rows = lib.write_sequence_examples(
            path.encode(), n_chunk,
            "\n".join(dense_names).encode(), len(dense_names),
            as_f32(dense[lo:hi] if len(dense_names) else dense),
            "\n".join(cat_names).encode(), len(cat_names), cat_blob,
            as_i64(cat_offsets),
            "\n".join(label_names).encode(), len(label_names),
            as_f32(labels[lo:hi] if len(label_names) else labels),
            "\n".join(seq_names).encode(), len(seq_names), seq_blob,
            as_i64(tok_offsets), as_i64(row_offsets),
            n_threads, 1 if (done or append) else 0,
        )
        if rows != n_chunk:
            raise IOError(f"native writer failed on {path} ({rows}/{n_chunk} "
                          f"at row {lo})")
        done = hi
        if n_rows == 0:
            break
    return n_rows


def _count_records(path: str) -> int:
    """Fast record count by walking the TFRecord framing."""
    import struct

    n = 0
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return n
            (length,) = struct.unpack("<Q", header[:8])
            f.seek(length + 4, 1)
            n += 1


def read_dataset(
    path: str,
    schema: Schema,
    vocabs: VocabularyStore,
    limit: int | None = None,
    verify_crc: bool = False,
    skip: int = 0,
    start_offset: int = -1,
    end_offset_box: list | None = None,
    n_threads: int = 0,
) -> DatasetArrays:
    """Native parse + translate of a SequenceExample TFRecord file.

    ``skip``/``limit`` select a record range, enabling bounded-memory
    chunked loading (data/pipeline.stream_batches) — the scaling seam for
    splits larger than host RAM.  ``start_offset`` (a byte position carried
    from a previous read's ``end_offset_box``) replaces the record-skip walk
    with one seek, keeping chunked streaming O(records) overall; when
    ``limit`` is given the whole-file record count is skipped too.
    """
    lib = _load()
    reader = lib.reader_create()
    try:
        for name in schema.dense_names:
            lib.reader_add_dense(reader, name.encode())
        for name in schema.labels:
            lib.reader_add_label(reader, name.encode())
        for f in schema.categorical:
            blob = "\n".join(vocabs[f.vocab].tokens()).encode()
            lib.reader_add_categorical(reader, f.name.encode(), blob, len(blob))
        seq_offsets = []
        offset = 0
        if limit is not None and start_offset > 0:
            # mid-stream chunk: allocate the (bounded) chunk size without a
            # full-file framing walk — rows are sliced to the actual count
            capacity = limit
        else:
            capacity = max(_count_records(path) - skip, 0)
            if limit is not None:
                capacity = min(capacity, limit)
        for f in schema.sequence:
            blob = "\n".join(vocabs[f.vocab].tokens()).encode()
            lib.reader_add_sequence(
                reader, f.name.encode(), f.max_length, blob, len(blob)
            )
            seq_offsets.append(offset)
            offset += capacity * f.max_length

        n_dense = len(schema.dense)
        n_labels = len(schema.labels)
        n_cat = len(schema.categorical)
        n_seq = len(schema.sequence)
        dense = np.zeros((capacity, n_dense), np.float32)
        labels = np.zeros((capacity, n_labels), np.float32)
        cats = np.zeros((capacity, n_cat), np.int32)
        seqs = np.zeros((offset,), np.int32)
        seq_lens = np.zeros((capacity, n_seq), np.int32)
        offsets_arr = np.asarray(seq_offsets, np.int64)
        end_off = ctypes.c_int64(-1)

        rows = lib.reader_read_file(
            reader, path.encode(), capacity,
            dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            seqs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            seq_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            1 if verify_crc else 0,
            skip, start_offset, ctypes.byref(end_off),
            n_threads,  # 0 = auto (hardware concurrency, capped 16)
        )
        if rows < 0:
            raise IOError(f"native reader failed on {path}")
        rows = int(rows)
        if end_offset_box is not None:
            end_offset_box.append(int(end_off.value))

        sequences = {}
        for i, f in enumerate(schema.sequence):
            block = seqs[seq_offsets[i] : seq_offsets[i] + capacity * f.max_length]
            sequences[f.name] = (
                block.reshape(capacity, f.max_length)[:rows],
                seq_lens[:rows, i].copy(),
            )
        return DatasetArrays(
            dense=dense[:rows],
            categorical={
                f.name: cats[:rows, i].copy()
                for i, f in enumerate(schema.categorical)
            },
            sequences=sequences,
            labels=labels[:rows],
        )
    finally:
        lib.reader_destroy(reader)


def permute_rows(arr: "np.ndarray", order: "np.ndarray",
                 n_threads: int | None = None) -> "np.ndarray":
    """dst[i] = arr[order[i]] along axis 0 — threaded C row gather.

    ~memory-bandwidth-limited and scales with cores, vs numpy's
    single-threaded fancy indexing.  Falls back to numpy if the native
    library cannot be built.
    """
    if len(order) != arr.shape[0]:
        raise ValueError(
            f"permute_rows needs a full permutation: len(order)={len(order)} "
            f"!= rows={arr.shape[0]} (the C gather loops over rows and would "
            "read past the end of a shorter order)"
        )
    try:
        lib = _load()
    except Exception:
        return arr[order]
    arr = np.ascontiguousarray(arr)
    order = np.ascontiguousarray(order, dtype=np.int64)
    out = np.empty_like(arr)
    row_bytes = arr.dtype.itemsize * int(np.prod(arr.shape[1:], dtype=np.int64))
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    lib.permute_rows(
        arr.ctypes.data_as(ctypes.c_char_p),
        out.ctypes.data_as(ctypes.c_char_p),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        arr.shape[0], row_bytes, n_threads,
    )
    return out
