"""ctypes binding to the native tokenizer (tools/src/tokenizer.cc).

Single-pass C++ scanner for the corpus hot path (reference data.py:36-52
semantics: per-line words + <s>, OOV -> <unk>). Falls back transparently to
the python implementation when the shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "tools", "bin",
                 "libbayeslm_tokenizer.so"),
    "tools/bin/libbayeslm_tokenizer.so",
]

_lib = None
_build_tried = False


def _try_autobuild() -> None:
    """Best-effort `make -C tools` when the .so is missing.

    The shared library is a build artifact (gitignored), so a fresh clone or
    a wiped build dir would otherwise silently drop every native fast path
    (the batch hypothesis encoder alone is ~30% of a warm rescoring pass).
    One attempt per process; BAYESLM_NO_AUTOBUILD=1 opts out.
    """
    global _build_tried
    if _build_tried or os.environ.get("BAYESLM_NO_AUTOBUILD") == "1":
        return
    _build_tried = True
    tools_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tools"))
    if not os.path.exists(os.path.join(tools_dir, "Makefile")):
        return
    import subprocess
    try:
        subprocess.run(["make", "-C", tools_dir], capture_output=True,
                       timeout=300, check=False)
    except Exception:
        pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not any(os.path.exists(os.path.abspath(p)) for p in _LIB_PATHS):
        _try_autobuild()
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.blm_vocab_load.restype = ctypes.c_void_p
            lib.blm_vocab_load.argtypes = [ctypes.c_char_p]
            lib.blm_vocab_free.argtypes = [ctypes.c_void_p]
            lib.blm_vocab_size.restype = ctypes.c_int64
            lib.blm_vocab_size.argtypes = [ctypes.c_void_p]
            lib.blm_tokenize.restype = ctypes.c_int64
            lib.blm_tokenize.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ]
            lib.blm_free_ids.argtypes = [ctypes.POINTER(ctypes.c_int32)]
            lib.blm_free_i64.argtypes = [ctypes.POINTER(ctypes.c_int64)]
            lib.blm_vocab_from_pairs.restype = ctypes.c_void_p
            lib.blm_vocab_from_pairs.argtypes = [ctypes.c_char_p]
            lib.blm_encode_lines.restype = ctypes.c_int64
            lib.blm_encode_lines.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


class NativeTokenizer:
    """Holds a loaded native vocab; tokenize() returns int32 numpy arrays."""

    def __init__(self, words_txt: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tokenizer library not built (make -C tools)")
        self._lib = lib
        self._vocab = lib.blm_vocab_load(words_txt.encode())
        if not self._vocab:
            raise RuntimeError(f"failed to load vocab from {words_txt}")

    def __len__(self) -> int:
        return int(self._lib.blm_vocab_size(self._vocab))

    def tokenize(self, text_path: str) -> np.ndarray:
        out = ctypes.POINTER(ctypes.c_int32)()
        n = self._lib.blm_tokenize(self._vocab, text_path.encode(), ctypes.byref(out))
        if n < 0:
            raise RuntimeError(f"native tokenize failed for {text_path}")
        try:
            arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
        finally:
            self._lib.blm_free_ids(out)
        return arr

    def __del__(self):
        try:
            if getattr(self, "_vocab", None):
                self._lib.blm_vocab_free(self._vocab)
        except Exception:
            pass


class NativeEncoder:
    """Batch hypothesis encoder over an arbitrary word→id mapping (the
    N-best scorer's encode hot path). encode_lines() maps a newline-joined
    block of hypotheses to (flat int32 ids, int64 offsets, int32 per-line
    OOV counts) in one C call — OOV words map to <unk> and are tallied like
    the dev scorer's count (`…copy.py`:123-144).

    Returns None from ``build`` when the shared library isn't present or
    the mapping contains whitespace-bearing words (can't be serialized to
    the "word idx" pair buffer)."""

    def __init__(self, lib, handle, bos: int):
        self._lib = lib
        self._vocab = handle
        self.bos = bos

    @staticmethod
    def build(word2idx) -> "Optional[NativeEncoder]":
        lib = _load()
        if lib is None:
            return None
        try:
            if any(not isinstance(w, str) or " " in w or "\t" in w
                   or "\n" in w for w in word2idx):
                return None
            buf = "\n".join(
                f"{w} {i}" for w, i in word2idx.items()).encode("utf-8")
        except Exception:
            return None
        h = lib.blm_vocab_from_pairs(buf)
        if not h:
            return None
        return NativeEncoder(lib, h, word2idx.get("<s>", 0))

    def encode_lines(self, text: str):
        ids_p = ctypes.POINTER(ctypes.c_int32)()
        offs_p = ctypes.POINTER(ctypes.c_int64)()
        oov_p = ctypes.POINTER(ctypes.c_int32)()
        n = self._lib.blm_encode_lines(
            self._vocab, text.encode("utf-8"), ctypes.byref(ids_p),
            ctypes.byref(offs_p), ctypes.byref(oov_p))
        try:
            offs = np.ctypeslib.as_array(offs_p, shape=(n + 1,)).copy()
            total = int(offs[-1])
            ids = (np.ctypeslib.as_array(ids_p, shape=(total,)).copy()
                   if total else np.zeros((0,), np.int32))
            oov = np.ctypeslib.as_array(oov_p, shape=(n,)).copy()
        finally:
            self._lib.blm_free_ids(ids_p)
            self._lib.blm_free_i64(offs_p)
            self._lib.blm_free_ids(oov_p)
        return ids, offs, oov

    def __del__(self):
        try:
            if getattr(self, "_vocab", None):
                self._lib.blm_vocab_free(self._vocab)
        except Exception:
            pass
