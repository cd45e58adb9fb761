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


def encode_all_native(nbest, enc, backward: bool = False):
    """Batch encode_hyp for the common (no spliced-context) path via the
    native tokenizer (data/native.py NativeEncoder): ONE C call maps EVERY
    hypothesis of the whole N-best set, and the BOS framing is vectorized
    numpy scatters — identical (inp, tgt, n_ctx=0, n_oov) tuples to
    encode_hyp, as int32 array views into two shared flat buffers instead
    of per-hyp lists. The python encode loop used to cost ~1/3 of a whole
    warm rescoring pass on the 1-core host.

    Returns {utt_key: [(inp, tgt, 0, oov), …]}."""
    keys = list(nbest)
    counts = [len(nbest[k]) for k in keys]
    all_hyps = [h for k in keys for h in nbest[k]]
    if not all_hyps:
        return {k: [] for k in keys}
    ids, offs, oov = enc.encode_lines("\n".join(all_hyps))
    n = len(all_hyps)
    N = ids.shape[0]
    offs = offs.astype(np.int64)
    hyp_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    pos = np.arange(N, dtype=np.int64)
    if backward:
        # reverse word order within each hypothesis (dev scorer
        # `--model_var back`): mirror each id inside its own span
        ids = ids[offs[hyp_of] + (offs[hyp_of + 1] - 1 - pos)]
    # hyp i's frame spans [offs[i]+i, offs[i+1]+i+1): BOS, then its ids
    # (inp) / its ids, then EOS-as-BOS (tgt) — reference framing :87-120
    inp_flat = np.empty(N + n, np.int32)
    tgt_flat = np.empty(N + n, np.int32)
    arange_n = np.arange(n, dtype=np.int64)
    inp_flat[pos + hyp_of + 1] = ids
    inp_flat[offs[:-1] + arange_n] = enc.bos
    tgt_flat[pos + hyp_of] = ids
    tgt_flat[offs[1:] + arange_n] = enc.bos
    starts = offs[:-1] + arange_n
    ends = offs[1:] + arange_n + 1
    out = {}
    i = 0
    for k, c in zip(keys, counts):
        out[k] = [
            (inp_flat[starts[j]:ends[j]], tgt_flat[starts[j]:ends[j]], 0,
             int(oov[j]))
            for j in range(i, i + c)
        ]
        i += c
    return out


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
