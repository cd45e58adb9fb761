"""N-best list I/O and batching utilities.

File formats are byte-compatible with the reference scorer
(compute_sentence_scores_bayes_jianwei.py): input lines ``utt-N word word …``
(load_nbest, :20-51), output lines ``utt-N score`` with 4 decimals
(write_scores, :283-303). Keys group by everything before the last ``-``.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np


def load_nbest(path: str) -> "OrderedDict[str, List[str]]":
    nbest: "OrderedDict[str, List[str]]" = OrderedDict()
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            try:
                key, hyp = line.split(" ", 1)
            except ValueError:
                key, hyp = line, " "
            key = key.rsplit("-", 1)[0]
            nbest.setdefault(key, []).append(hyp)
    return nbest


def write_scores(nbest_and_scores, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for key, pairs in nbest_and_scores.items():
            for idx, (_, score) in enumerate(pairs, 1):
                f.write("%s-%d %.4f\n" % (key, idx, score))


def encode_hyp(
    hyp: str,
    word2idx: Dict[str, int],
    bos: str = "<s>",
    unk: str = "<unk>",
    backward: bool = False,
    context: str = "",
    splice_len: int = 0,
):
    """'<s> w1 … wn' input ids and 'w1 … wn <s>' target ids
    (get_input_and_target, reference scorer :87-120).

    ``backward`` reverses the hypothesis word order (dev scorer
    `--model_var back`). ``context``/``splice_len`` prepend up to splice_len
    trailing context words between <s> and the hypothesis (dev scorer
    `--seg_wise`); the returned ``n_ctx`` counts target positions to exclude
    from the score so hypothesis scores stay comparable.

    ``n_oov`` counts words (context + hypothesis) mapped to ``<unk>`` —
    the dev scorer's OOV tally over the encoded input string
    (`…copy.py`:123-144, reported as a total at :409).
    """
    words = hyp.split()
    if backward:
        words = words[::-1]
    ctx_words = context.split()[-splice_len:] if (context and splice_len) else []
    unk_id = word2idx.get(unk, 0)
    # single pass: -1 marks OOV (vocab ids are non-negative), so the OOV
    # tally doesn't pay a second full dict scan
    ids = [word2idx.get(w, -1) for w in words]
    ctx_ids = [word2idx.get(w, -1) for w in ctx_words]
    n_oov = ids.count(-1) + ctx_ids.count(-1)
    if n_oov:
        ids = [unk_id if i < 0 else i for i in ids]
        ctx_ids = [unk_id if i < 0 else i for i in ctx_ids]
    bos_id = word2idx.get(bos, 0)
    inp = [bos_id] + ctx_ids + ids
    tgt = ctx_ids + ids + [bos_id]
    return inp, tgt, len(ctx_ids), n_oov


def pad_batch(
    seqs_in: List[List[int]],
    seqs_tgt: List[List[int]],
    T: int,
    B: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad to a (T, B) time-major batch + per-token mask + lengths."""
    n = len(seqs_in)
    assert n <= B
    data = np.zeros((T, B), np.int32)
    tgt = np.zeros((T, B), np.int32)
    mask = np.zeros((T, B), np.float32)
    lens = np.zeros((B,), np.int32)
    for j, (x, y) in enumerate(zip(seqs_in, seqs_tgt)):
        L = min(len(x), T)
        data[:L, j] = x[:L]
        tgt[:L, j] = y[:L]
        mask[:L, j] = 1.0
        lens[j] = L
    return data, tgt, mask, lens


def length_buckets(max_len: int, n_buckets: int = 5) -> List[int]:
    """Up to ``n_buckets`` geometrically spaced bucket boundaries from 16 to
    ``max_len``, rounded up to multiples of 8 (TPU sublane alignment). Each
    boundary is a jit cache key, so more buckets = less padding but more
    compiles."""
    if max_len <= 16:
        return [max_len]
    out = []
    for i in range(n_buckets):
        b = 16.0 * (max_len / 16.0) ** (i / (n_buckets - 1))
        b = min(int(-(-b // 8) * 8), max_len)  # round up to multiple of 8
        if not out or b > out[-1]:
            out.append(b)
    if out[-1] != max_len:
        out.append(max_len)
    return out


def bucket_for(length: int, buckets) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def rewrite_nbest(words_path: str, out_dir: str, max_n: int = 20) -> int:
    """Split an n-best words archive into per-rank files.

    Equivalent of the reference's word2vec.ipynb `rewrite_nbest` helper:
    lines "utt-N w1 w2 …" are distributed into out_dir/words.<N> files (one
    file per hypothesis rank). Returns the number of ranks written.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    handles = {}
    try:
        with open(words_path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split(" ", 1)
                if not parts[0]:
                    continue
                key, rest = parts[0], parts[1] if len(parts) > 1 else ""
                utt, n = key.rsplit("-", 1)
                n = int(n)
                if n > max_n:
                    continue
                if n not in handles:
                    handles[n] = open(os.path.join(out_dir, f"words.{n}"), "w",
                                      encoding="utf-8")
                handles[n].write(f"{utt} {rest}\n")
    finally:
        for h in handles.values():
            h.close()
    return len(handles)
