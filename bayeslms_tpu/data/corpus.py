"""Corpus loading and batch layout.

Reference semantics:
- tokenize (`data.py:36-52`): per line, append ``<s>``, map OOV to ``<unk>``,
  concatenate all lines into one flat id stream.
- batchify (`train.py:167-179`): trim the stream to ``(len // bsz) * bsz``
  tokens and reshape to ``(rows, bsz)`` where ``rows = len // bsz`` — i.e.
  ``bsz`` independent contiguous streams laid out column-wise.
- get_batch (`train.py:299-303`): window ``[i, i+seq_len)`` as input and
  ``[i+1, i+1+seq_len)`` as (flattened) target.

TPU notes: batchify/get_batch are pure reshapes/slices on a host numpy array;
the per-step windows are stacked once into a static ``(num_windows, seq_len,
bsz)`` array so the epoch can run as a single ``lax.scan``-able dataset with
static shapes (ragged final window is dropped, see ``windows``).
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np

from .vocab import Vocab


class Corpus:
    """Train/valid/test id streams built from text files + words.txt.

    Uses the native C++ tokenizer (tools/src/tokenizer.cc via ctypes) when
    built; otherwise the python path. Both produce identical id streams
    (tests/test_tools_cpp.py asserts this).
    """

    def __init__(self, path: str, use_native: bool = True) -> None:
        self.vocab = Vocab.from_file(os.path.join(path, "words.txt"))
        self._native = None
        if use_native:
            try:
                from .native import NativeTokenizer, available

                if available():
                    self._native = NativeTokenizer(os.path.join(path, "words.txt"))
            except Exception:
                self._native = None
        self.train = self.tokenize(os.path.join(path, "train.txt"))
        self.valid = self.tokenize(os.path.join(path, "valid.txt"))
        self.test = self.tokenize(os.path.join(path, "test.txt"))

    def tokenize(self, path: str) -> np.ndarray:
        assert os.path.exists(path), path
        if self._native is not None:
            return self._native.tokenize(path)
        ids = []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                words = line.split() + ["<s>"]
                ids.extend(self.vocab.encode(words))
        return np.asarray(ids, dtype=np.int32)


def batchify(stream: np.ndarray, bsz: int) -> np.ndarray:
    """(tokens,) -> (tokens // bsz, bsz), column-per-stream layout."""
    nbatch = stream.shape[0] // bsz
    data = stream[: nbatch * bsz]
    return data.reshape(bsz, nbatch).T.copy()


def get_batch(source: np.ndarray, i: int, seq_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Window [i, i+seq_len) of a batchified (rows, bsz) array.

    Returns (data, target) with data (L, bsz) time-major and target (L, bsz);
    L may be < seq_len at the ragged end (reference train.py:299-303).
    """
    L = min(seq_len, source.shape[0] - 1 - i)
    data = source[i : i + L]
    target = source[i + 1 : i + 1 + L]
    return data, target


def windows(source: np.ndarray, seq_len: int, drop_ragged: bool = True):
    """Stack all full-length windows into (N, seq_len, bsz) input/target.

    Static-shape dataset for jit-friendly epochs. The reference iterates
    `range(0, rows - 1, seq_len)` including a final ragged window; with
    ``drop_ragged=False`` the ragged tail is returned separately so eval can
    reproduce the reference token count exactly.
    """
    rows = source.shape[0]
    starts = [i for i in range(0, rows - 1, seq_len) if i + seq_len + 1 <= rows]
    data = np.stack([source[i : i + seq_len] for i in starts]) if starts else (
        np.zeros((0, seq_len, source.shape[1]), dtype=source.dtype)
    )
    tgt = np.stack([source[i + 1 : i + 1 + seq_len] for i in starts]) if starts else (
        np.zeros((0, seq_len, source.shape[1]), dtype=source.dtype)
    )
    if drop_ragged:
        return data, tgt
    tail_start = starts[-1] + seq_len if starts else 0
    tail = get_batch(source, tail_start, seq_len) if tail_start < rows - 1 else None
    return data, tgt, tail


def apply_data_fraction(stream: np.ndarray, fraction: float) -> np.ndarray:
    """Data-size ablation (reference --mark base-0.Xset, train.py:151-165)."""
    if fraction >= 1.0:
        return stream
    return stream[: int(len(stream) * fraction)]
