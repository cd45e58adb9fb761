"""Transformer-XL cross-utterance memory layout (RescoreConfig.xl_mems).

Utterances stay serial per chain (like LSTM carry-over); every
hypothesis of an utterance attends over segment memories built from
the previous utterance's FIRST hypothesis, with positions continuing
from the real memory length — exactly full-context scoring of
[prev; hyp] (the capability the dev scorer's `--model_var XL` gestured
at; its own `mems = tuple()` reset per hypothesis carried nothing,
`…copy.py`:197-209). Memory lengths are bucketed (right-padded +
mem_len masking) so compiles stay bounded.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..nbest import bucket_for, length_buckets, pad_batch
from . import common


def xl_mem_impl(s, params, data):
    """data: (Mb, 1) right-padded previous-first-hyp ids -> per-layer
    (Mb, 1, E) memories (layer inputs; causal attention keeps the real
    prefix exact regardless of padding)."""
    _, mems = s.model.apply(
        {"params": params}, data, deterministic=True,
        return_hidden=True, return_mems=True,
    )
    return mems


def xl_score_impl(s, params, data, tgt, ce_mask, mems, mem_len):
    B = data.shape[1]
    mems_b = [jnp.broadcast_to(m, (m.shape[0], B, m.shape[2])) for m in mems]
    if s.use_fused_ce:
        h = s.model.apply(
            {"params": params}, data, deterministic=True, mems=mems_b,
            mem_len=mem_len, return_hidden=True,
        )
        return common.fused_scores(s, params, h, tgt, ce_mask)
    logits = s.model.apply(
        {"params": params}, data, deterministic=True, mems=mems_b,
        mem_len=mem_len,
    )
    return common.masked_ce_sums(logits, tgt, ce_mask)


def score_xl(s, nbest, word2idx, stream_fn=None, enc_all=None):
    # The chain dependency here lives in the INPUTS (each utterance's
    # memory is built from the previous utterance's first-hyp token ids,
    # known on the host) — not in device results. So every mem-build and
    # score call is dispatched asynchronously and the whole run syncs
    # ONCE at the end; a per-utterance np.asarray would pay a ~25 ms
    # tunnel round trip per utterance.
    rc = s.rcfg
    buckets = length_buckets(rc.max_hyp_len)
    N = max((len(h) for h in nbest.values()), default=1)
    scores: Dict[tuple, float] = {}
    last: Dict[str, list] = {}  # chain label -> previous first-hyp ids
    pending = []  # (device scores handle, key, n_hyps)
    for k, hyps in nbest.items():
        label = stream_fn(k) if stream_fn else "_all"
        enc = enc_all[k]
        T = bucket_for(max(len(x) for x, _, _, _ in enc), buckets)
        data, tgt, mask, _ = pad_batch(
            [x for x, *_ in enc], [y for _, y, *_ in enc], T, N
        )
        prev = last.get(label)
        if prev is None:
            out = s._tm_step(
                s.params, s.params, jnp.asarray(data),
                jnp.asarray(tgt), jnp.asarray(mask),
            )
        else:
            Mb = bucket_for(len(prev), buckets)
            pdata = np.zeros((Mb, 1), np.int32)
            pdata[: len(prev), 0] = prev
            mems = s._xl_mem_step(s.params, jnp.asarray(pdata))
            out = s._xl_score_step(
                s.params, jnp.asarray(data), jnp.asarray(tgt),
                jnp.asarray(mask), mems,
                jnp.asarray(min(len(prev), Mb), jnp.int32),
            )
        pending.append((out, k, len(hyps)))
        if enc:
            # over-long previous utterance: keep BOS + the TRAILING
            # tokens (the words adjacent to the next utterance), like
            # the splice path's context.split()[-splice_len:]
            ids = list(enc[0][0])  # list() also accepts np.int32 arrays
            if len(ids) > rc.max_hyp_len:
                ids = [ids[0]] + ids[-(rc.max_hyp_len - 1):]
            last[label] = ids
    for out, k, n in pending:
        out = np.asarray(out)
        for i in range(n):
            scores[(k, i)] = float(out[i])
    return common.assemble(nbest, scores)
