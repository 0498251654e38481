"""Vocabulary compiler: token files -> integer id maps, applied on the host.

The reference performs vocabulary lookup *inside* the TF graph with
``fc.categorical_column_with_vocabulary_file`` (reference
algorithm/WideAndDeep/wide_and_deep.py:95-106) against one-token-per-line
files emitted by the ETL (reference DataGenerator.py:206-210).  TPUs have no
string processing, so translation moves into the host input pipeline: a
``Vocabulary`` maps token -> id once, and the device only sees int32 ids.

Id convention: 0 = PAD / OOV / missing; file line ``i`` (0-based) -> id
``i + 1``.  TF maps OOV to -1 and zero-masks it in
``safe_embedding_lookup_sparse``; reserving row 0 achieves the same semantics
with TPU-friendly non-negative indices.
"""

from __future__ import annotations

import os
from typing import Iterable, Mapping

import numpy as np

PAD_ID = 0


class Vocabulary:
    """One token->id map. Ids are 1-based; unknown tokens map to PAD_ID (0)."""

    def __init__(self, tokens: Iterable[str]):
        self._token_to_id: dict[str, int] = {}
        for tok in tokens:
            if tok not in self._token_to_id:
                self._token_to_id[tok] = len(self._token_to_id) + 1

    @classmethod
    def from_file(cls, path: str) -> "Vocabulary":
        with open(path, "r", encoding="utf-8") as f:
            return cls(line.rstrip("\n") for line in f if line.strip())

    def __len__(self) -> int:
        """Number of real tokens (excludes the PAD/OOV slot)."""
        return len(self._token_to_id)

    def __contains__(self, token: str) -> bool:
        return token in self._token_to_id

    def lookup(self, token: str) -> int:
        return self._token_to_id.get(token, PAD_ID)

    def lookup_many(self, tokens: Iterable[str]) -> np.ndarray:
        get = self._token_to_id.get
        return np.fromiter((get(t, PAD_ID) for t in tokens), dtype=np.int32)

    def tokens(self) -> list[str]:
        return list(self._token_to_id)


class VocabularyStore:
    """All vocabularies of a dataset, keyed by vocab name."""

    def __init__(self, vocabs: Mapping[str, Vocabulary]):
        self.vocabs = dict(vocabs)

    @classmethod
    def from_dir(cls, vocab_dir: str) -> "VocabularyStore":
        """Load every ``<name>.txt`` in a reference-layout vocabulary dir."""
        vocabs = {}
        for fname in sorted(os.listdir(vocab_dir)):
            if fname.endswith(".txt"):
                name = fname[: -len(".txt")]
                vocabs[name] = Vocabulary.from_file(os.path.join(vocab_dir, fname))
        return cls(vocabs)

    def __getitem__(self, name: str) -> Vocabulary:
        return self.vocabs[name]

    def sizes(self) -> dict[str, int]:
        return {name: len(v) for name, v in self.vocabs.items()}
