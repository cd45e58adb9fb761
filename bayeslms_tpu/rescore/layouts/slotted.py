"""Slotted layouts: one hypothesis per (bucketed-T, column) slot.

- `score_bucketed` — global length-bucketed batching (transformer / no
  carry-over; also hosts the MC-average inference paths, which forbid
  the packed layouts).
- `score_carry` — serial utterances, batched hypotheses, exact LSTM
  cross-utterance carry-over (ref :261-274) with per-utterance slots.

The packed twins (layouts/packed.py) are preferred by the dispatch
registry whenever their gates allow; these slotted paths remain the
fallback (CPU/XLA path, MC, cross-family interpolation, env opt-outs)
and the parity yardstick the packed layouts are tested against.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...models.lstm_lm import init_hidden
from ..nbest import bucket_for, length_buckets
from . import common


# ------------------------------------------------------------ jit bodies
def bucket_chunk_impl(s, params, params2, m2, data, tgt, mask, ce_mask,
                      idx=None, seg=None, n_real=None):
    """data/tgt/mask: (n, T, B) — n same-shape batches scored in ONE
    device call (host round trips cost ~25 ms each through the tunnel).
    ``idx/seg/n_real``: host-computed gather plan of the real token
    positions (fused path only) so the vocab projection never scores
    padding. Inputs arrive in compact transfer dtypes (uint16/uint8).
    ``m2``: fused-interp decoder constants (see common.interp_m2)."""
    data = data.astype(jnp.int32)
    tgt = tgt.astype(jnp.int32)
    mask = mask.astype(jnp.float32)
    if ce_mask is not None:
        ce_mask = ce_mask.astype(jnp.float32)
    if s.use_fused_ce:
        B = data.shape[2]
        if not s.is_tm:
            cdtype = jnp.dtype(s.cfg.compute_dtype)
            h0 = init_hidden(s.cfg.nlayers, B, s.cfg.nhid, dtype=cdtype)
        if s.interp and not s.cfg2.is_transformer:
            h0_2 = init_hidden(
                s.cfg2.nlayers, B, s.cfg2.nhid,
                dtype=jnp.dtype(s.cfg2.compute_dtype))

        def one_model(model, is_tm, prms, hinit, d, m):
            if is_tm:
                return model.apply(
                    {"params": prms}, d, deterministic=True,
                    return_hidden=True)
            h, _ = model.apply(
                {"params": prms}, d, hinit, deterministic=True,
                step_mask=m, return_hidden=True)
            return h

        def body(_, inp):
            d, t, m = inp
            h = one_model(s.model, s.is_tm, params,
                          None if s.is_tm else h0, d, m)
            if s.interp:
                h2 = one_model(
                    s.model2, s.cfg2.is_transformer, params2,
                    None if s.cfg2.is_transformer else h0_2, d, m)
                return None, (h, h2)
            return None, h

        _, hs = jax.lax.scan(body, None, (data, tgt, mask))
        hs2 = None
        if s.interp:
            hs, hs2 = hs
            hs2 = hs2.reshape(-1, hs2.shape[-1])
        n, _, B = tgt.shape
        scores = common.fused_scores_packed(
            s, params, hs.reshape(-1, hs.shape[-1]), tgt.reshape(-1),
            idx, seg, n_real, n * B, hs2, m2,
        )
        return scores.reshape(n, B)
    if s.is_tm:
        def body(_, inp):
            d, t, m, cm = inp
            return None, common.tm_scores(s, params, params2, d, t, cm)
    else:
        B = data.shape[2]
        cdtype = jnp.dtype(s.cfg.compute_dtype)
        h = init_hidden(s.cfg.nlayers, B, s.cfg.nhid, dtype=cdtype)
        cfg2 = s.cfg2 if s.interp else s.cfg
        h2 = init_hidden(cfg2.nlayers, B, cfg2.nhid,
                         dtype=jnp.dtype(cfg2.compute_dtype))

        def body(_, inp):
            d, t, m, cm = inp
            sc, _, _ = common.rnn_scores(s, params, params2, d, t, m, cm, h, h2)
            return None, sc

    _, scores = jax.lax.scan(body, None, (data, tgt, mask, ce_mask))
    return scores  # (n, B)


# -- serial utterances, batched hypotheses (exact carry-over).
# The whole utterance chain runs ON DEVICE as a lax.scan over utterances
# (one chunked device call instead of one per utterance): a host round
# trip costs ~25 ms through the TPU tunnel, which would dominate the
# sub-ms per-utterance compute. Utterances are padded to a common
# (T_bucket, N) shape per chunk; the step_mask machinery keeps the
# carried hidden exact at each hypothesis's true length.
def carry_chunk_impl(s, params, params2, m2, data, tgt, mask, ce_mask,
                     h1, h2, N: int, idx=None, seg=None, n_real=None):
    """data/tgt/mask: (U, T, G*N) — U serial utterance slots over G
    parallel chains of N hypotheses; h1/h2: (layers, G, H) carried;
    idx/seg/n_real: real-token gather plan (fused decode path). Inputs
    arrive in compact transfer dtypes (uint16/uint8). ``m2``: fused
    interpolated-decode constants (see common.interp_m2)."""
    data = data.astype(jnp.int32)
    tgt = tgt.astype(jnp.int32)
    mask = mask.astype(jnp.float32)
    if ce_mask is not None:
        ce_mask = ce_mask.astype(jnp.float32)

    # shape-agnostic over each carry leaf (the interpolation model may
    # have a different nlayers/nhid geometry than the main model)
    def bcast(c):
        # (L, G, H) -> (L, G*N, H): each chain's state feeds its N hyps
        def f(a):
            L_, G_, H_ = a.shape
            return jnp.broadcast_to(
                a[:, :, None, :], (L_, G_, N, H_)).reshape(L_, G_ * N, H_)
        return jax.tree.map(f, c)

    def first_hyp(nh):
        # (L, G*N, H) -> (L, G, H): carry each chain's FIRST hypothesis
        # (ref :261-274)
        def f(a):
            L_, B_, H_ = a.shape
            return a.reshape(L_, B_ // N, N, H_)[:, :, 0, :]
        return jax.tree.map(f, nh)

    if s.use_fused_ce:
        # Collect pre-decoder states inside the scan; decode+CE happens
        # ONCE per chunk with the fused Pallas kernel OUTSIDE the scan
        # (a pallas call inside a large scan body explodes remote-compile
        # time), and only over the REAL token positions (idx/w/seg
        # gather plan) — the vocab projection dominates rescoring cost
        # and padded layouts otherwise score ~3-4x more tokens than
        # exist. Hidden stack: (U, T, G*N, H) bf16.
        def per_utt_h(carry, inp):
            c1, c2 = carry
            d_t, t_t, m_t = inp
            hseq, nh1 = s.model.apply(
                {"params": params}, d_t, bcast(c1), deterministic=True,
                step_mask=m_t, return_hidden=True,
            )
            if s.interp:
                hseq2, nh2 = s.model2.apply(
                    {"params": params2}, d_t, bcast(c2),
                    deterministic=True, step_mask=m_t, return_hidden=True,
                )
                return (first_hyp(nh1), first_hyp(nh2)), (hseq, hseq2)
            return (first_hyp(nh1), c2), hseq

        (h1, h2), hs = jax.lax.scan(
            per_utt_h, (h1, h2), (data, tgt, mask)
        )
        hs2 = None
        if s.interp:
            hs, hs2 = hs
            hs2 = hs2.reshape(-1, hs2.shape[-1])
        U, _, GN = tgt.shape
        scores = common.fused_scores_packed(
            s, params, hs.reshape(-1, hs.shape[-1]), tgt.reshape(-1),
            idx, seg, n_real, U * GN, hs2, m2,
        ).reshape(U, GN)
        return scores, h1, h2

    def per_utt(carry, inp):
        c1, c2 = carry
        d_t, t_t, m_t, cm_t = inp
        scores, nh1, nh2 = common.rnn_scores(
            s, params, params2, d_t, t_t, m_t, cm_t, bcast(c1), bcast(c2)
        )
        return (first_hyp(nh1), first_hyp(nh2)), scores

    (h1, h2), scores = jax.lax.scan(
        per_utt, (h1, h2), (data, tgt, mask, ce_mask)
    )
    return scores, h1, h2  # scores: (U, G*N)


def mc_impl(s, params, data, tgt, step_mask, ce_mask, key):
    """Monte-Carlo-average predictive scoring: average token
    probabilities over mc_samples posterior draws, score = -sum log
    p_avg(target). Generalizes the reference's posterior-mean eval to
    true MC inference (BASELINE config: Variational Transformer with
    MC-average inference)."""
    K = s.rcfg.mc_samples
    keys = jax.random.split(key, K)
    B = data.shape[1]

    def one(k):
        rngs = {"sample": k, "dropout": k}
        if s.is_tm:
            logits = s.mc_model.apply(
                {"params": params}, data, deterministic=False, rngs=rngs
            )
        else:
            h = init_hidden(
                s.cfg.nlayers, B, s.cfg.nhid,
                dtype=jnp.dtype(s.cfg.compute_dtype),
            )
            logits, _ = s.mc_model.apply(
                {"params": params}, data, h, deterministic=False, rngs=rngs,
                step_mask=step_mask,
            )
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    lps = jax.lax.map(one, keys)  # (K, T, B, V)
    lp_avg = jax.scipy.special.logsumexp(lps, axis=0) - jnp.log(float(K))
    token_lp = jnp.take_along_axis(lp_avg, tgt[..., None], axis=-1)[..., 0]
    return -(token_lp * ce_mask).sum(axis=0)


def mc_fused_impl(s, params, data, tgt, step_mask, keys, idx, seg, n_real):
    """Fused MC-average predictive scoring over a whole bucket stack.

    data/tgt/step_mask: (n, T, B); keys: (n, K) PRNG keys — row j's draws
    are split(key(j), K), EXACTLY the legacy per-row path's draws, so the
    two implementations average the same posterior samples. Per draw k,
    hidden states for all n rows are collected and the fused CE kernel
    scores only the real token positions (idx gather plan — this also
    excludes spliced-context positions from the score, like ce_mask);
    then  score = -sum_t [logsumexp_k(-ce_{k,t}) - log K]  per segment.
    The legacy path's (K, T, B, V) log-softmax stack never exists."""
    from ...ops.ce_pallas import fused_decode_ce

    K = s.rcfg.mc_samples
    data = data.astype(jnp.int32)
    tgt = tgt.astype(jnp.int32)
    step_mask = step_mask.astype(jnp.float32)
    n, _, B = tgt.shape
    tsel = jnp.take(tgt.reshape(-1), idx, axis=0)
    if not s.is_tm:
        h0 = init_hidden(
            s.cfg.nlayers, B, s.cfg.nhid,
            dtype=jnp.dtype(s.cfg.compute_dtype))

    def one(krow):
        # krow: (n,) keys — the k-th draw of every row
        def body(_, inp):
            d, m, kr = inp
            rngs = {"sample": kr, "dropout": kr}
            if s.is_tm:
                h = s.mc_model.apply(
                    {"params": params}, d, deterministic=False,
                    rngs=rngs, return_hidden=True)
            else:
                h, _ = s.mc_model.apply(
                    {"params": params}, d, h0, deterministic=False,
                    rngs=rngs, step_mask=m, return_hidden=True)
            return None, h

        _, hs = jax.lax.scan(body, None, (data, step_mask, krow))
        hsel = jnp.take(hs.reshape(-1, hs.shape[-1]), idx, axis=0)
        return fused_decode_ce(
            hsel, params["embedding"], params["decoder_b"], tsel)

    ces = jax.lax.map(one, keys.T)  # (K, M) = -log p_k(target)
    lp_avg = jax.scipy.special.logsumexp(-ces, axis=0) - jnp.log(float(K))
    w = (jnp.arange(idx.shape[0]) < n_real).astype(lp_avg.dtype)
    return -jax.ops.segment_sum(
        lp_avg * w, seg, num_segments=n * B).reshape(n, B)


# ------------------------------------------------------------ score fns
def score_bucketed(s, nbest, word2idx, stream_fn=None, enc_all=None):
    rc = s.rcfg
    items = []  # (key, idx, in_ids, tgt_ids, n_ctx)
    for key, hyps in nbest.items():
        for i, (x, y, nc, _) in enumerate(enc_all[key]):
            items.append((key, i, x, y, nc))
    buckets = length_buckets(rc.max_hyp_len)
    by_bucket: Dict[int, list] = {}
    for it in items:
        by_bucket.setdefault(bucket_for(len(it[2]), buckets), []).append(it)

    scores: Dict[tuple, float] = {}
    p2 = s.params2 if s.interp else s.params
    fused = s.use_fused_mc if rc.mc_samples > 0 else s.use_fused_ce
    for T, group in sorted(by_bucket.items()):
        Bc = -(-rc.batch_size // s._dp) * s._dp  # divisible by dp
        n = (len(group) + Bc - 1) // Bc
        rows = [
            (i // Bc, i % Bc, it[2], it[3], it[4])
            for i, it in enumerate(group)
        ]
        data, tgt, mask, ce_mask, plan = common.build_rows(
            s, rows, n, T, Bc, want_ce_mask=not fused)
        if rc.mc_samples > 0 and s.use_fused_mc:
            # same draws as the legacy per-row path: row j uses
            # split(key(j), K)
            keys = jnp.stack([
                jax.random.split(jax.random.key(j), rc.mc_samples)
                for j in range(n)
            ])
            out = np.asarray(s._mc_fused_step(
                s.params, jnp.asarray(data), jnp.asarray(tgt),
                jnp.asarray(mask), keys,
                *common.plan_args(s, data.shape, plan),
            ))
        elif rc.mc_samples > 0:
            outs = [
                s._mc_step(
                    s.params, jnp.asarray(data[j].astype(np.int32)),
                    jnp.asarray(tgt[j].astype(np.int32)),
                    jnp.asarray(mask[j].astype(np.float32)),
                    jnp.asarray(ce_mask[j]), jax.random.key(j),
                )
                for j in range(n)
            ]
            out = np.stack([np.asarray(o) for o in outs])
        else:
            if fused:
                extra = common.plan_args(s, data.shape, plan)
                cm = None
            else:
                extra = ()
                cm = jnp.asarray(ce_mask)
            out = np.asarray(
                s._bucket_step(
                    s.params, p2, common.interp_m2(s),
                    jnp.asarray(data), jnp.asarray(tgt),
                    jnp.asarray(mask), cm, *extra,
                )
            )  # (n, Bc)
        for i, (key, hid, _, _, _) in enumerate(group):
            scores[(key, hid)] = float(out[i // Bc, i % Bc])

    return common.assemble(nbest, scores)


def score_carry(s, nbest, word2idx, stream_fn=None, enc_all=None):
    from collections import OrderedDict

    rc = s.rcfg
    buckets = length_buckets(rc.max_hyp_len)
    N = max((len(h) for h in nbest.values()), default=1)
    keys = list(nbest.keys())

    # partition into independent chains, preserving order within each
    streams: "OrderedDict[str, list]" = OrderedDict()
    for k in keys:
        label = stream_fn(k) if stream_fn else "_all"
        streams.setdefault(label, []).append(k)
    stream_keys = list(streams.values())
    # dp sharding splits the g-major column blocks: pad with empty
    # chains (all-zero masks) so whole chains land on one shard
    while len(stream_keys) % s._dp != 0:
        stream_keys.append([])
    G = len(stream_keys)
    U_total = max(len(sk) for sk in stream_keys)

    enc = enc_all
    cdtype = jnp.dtype(s.cfg.compute_dtype)
    carry1 = init_hidden(s.cfg.nlayers, G, s.cfg.nhid, dtype=cdtype)
    # the interpolation model may have its own geometry (ref loads an
    # independent baseline checkpoint, :457-472)
    cfg2 = s.cfg2 if s.interp else s.cfg
    carry2 = init_hidden(
        cfg2.nlayers, G, cfg2.nhid, dtype=jnp.dtype(cfg2.compute_dtype))
    scores: Dict[tuple, float] = {}
    pending = []  # (device scores handle, slot_key) per chunk; ONE sync
    U_CHUNK = min(rc.carry_chunk_utts, U_total)
    for st in range(0, U_total, U_CHUNK):
        U = min(U_CHUNK, U_total - st)  # exact tail (jit key per size)
        # Per-chunk time bucket: T covers only the utterances in THIS
        # chunk window, so one long utterance inflates padding for its
        # own chunk only, not the whole run (geometric buckets keep the
        # number of compiled shapes bounded, like the bucketed path).
        chunk_max = max(
            (len(x)
             for skeys in stream_keys
             for k in skeys[st : st + U_CHUNK]
             for x, *_ in enc[k]),
            default=1,
        )
        T = bucket_for(chunk_max, buckets)
        rows = []
        slot_key = {}
        for g, skeys in enumerate(stream_keys):
            for u in range(U):
                if st + u >= len(skeys):
                    continue
                k = skeys[st + u]
                rows.extend(
                    (u, g * N + c, x, y, nc)
                    for c, (x, y, nc, _) in enumerate(enc[k])
                )
                slot_key[(u, g)] = k
        data, tgt, mask, ce_mask, plan = common.build_rows(
            s, rows, U, T, G * N, want_ce_mask=not s.use_fused_ce)
        if s.use_fused_ce:
            extra = common.plan_args(s, data.shape, plan)
            cm = None
        else:
            extra = ()
            cm = jnp.asarray(ce_mask)
        out, carry1, carry2 = s._carry_step(
            s.params, s.params2 if s.interp else s.params,
            common.interp_m2(s),
            jnp.asarray(data), jnp.asarray(tgt), jnp.asarray(mask),
            cm, carry1, carry2, N, *extra,
        )
        pending.append((out, slot_key))
        # short utterance slots in the ragged tail have all-zero masks:
        # hidden frozen, so each chain's carried state stays exact
        # across chunks. The device handle is NOT synced here — the
        # next chunk's encode/build runs while this one computes.

    for out, slot_key in pending:
        out = np.asarray(out)  # (U, G*N); blocks on first chunk only
        for (u, g), k in slot_key.items():
            for i in range(len(nbest[k])):
                scores[(k, i)] = float(out[u, g * N + i])

    return common.assemble(nbest, scores)
