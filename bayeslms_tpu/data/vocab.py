"""Vocabulary handling.

Reference semantics: BayesLMs `steps/pytorchnn/data.py:9-26` — a vocab file
with one "word index" pair per line; first occurrence wins; word ids are
assigned in file order (the index column is ignored, only order matters).
"""

from __future__ import annotations

from typing import Dict, List


class Vocab:
    """Word <-> id mapping read from a Kaldi-style words.txt."""

    def __init__(self) -> None:
        self.word2idx: Dict[str, int] = {}
        self.idx2word: List[str] = []

    @classmethod
    def from_file(cls, path: str) -> "Vocab":
        v = cls()
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                assert len(parts) == 2, f"bad vocab line: {line!r}"
                word = parts[0]
                if word not in v.word2idx:
                    v.idx2word.append(word)
                    v.word2idx[word] = len(v.idx2word) - 1
        return v

    @classmethod
    def from_words(cls, words) -> "Vocab":
        v = cls()
        for w in words:
            if w not in v.word2idx:
                v.idx2word.append(w)
                v.word2idx[w] = len(v.idx2word) - 1
        return v

    def encode(self, words, unk: str = "<unk>") -> List[int]:
        unk_id = self.word2idx.get(unk)
        out = []
        for w in words:
            i = self.word2idx.get(w)
            if i is None:
                if unk_id is None:
                    raise KeyError(f"OOV {w!r} and no {unk!r} in vocab")
                i = unk_id
            out.append(i)
        return out

    def __len__(self) -> int:
        return len(self.idx2word)

    def __contains__(self, w: str) -> bool:
        return w in self.word2idx
