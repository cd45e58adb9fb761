"""Packed layouts: several hypotheses share one time-axis column.

- `score_carry_packed` — packed-time LSTM carry-over: each chain's
  utterances lie consecutively along ONE time axis with per-utterance
  exact (capped) lengths and in-kernel state resets at utterance starts
  (~2-3x fewer sequential recurrence steps than per-utterance slots).
- `score_packed_nocarry` — independent hypotheses bin-packed into
  columns: transformer (causal-within-segment attention masks, positions
  restarting per segment) and recurrent (zero-state resets) twins.

Selection gates (`carry_allowed` / `nocarry_allowed`) are consulted by
the dispatch registry (layouts/__init__.py); the slotted layouts remain
the fallback and parity yardstick.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict

import jax.numpy as jnp
import numpy as np

import jax

from ...models.lstm_lm import init_hidden
from . import common


def carry_allowed(s) -> bool:
    """Packed-time carry-over: every recurrent core threads reset_mask
    (standard, Bayes, GP, Gauss-legacy, variational). Runs dp-sharded on
    a mesh (chains split as contiguous column blocks, one full packed
    impl per shard). Interpolated scoring (same-family pairs) rides the
    packed layout via the fused interpolated decode (use_fused_ce
    encodes the pair constraints); XL / MC fall back to slotted."""
    cfg, rcfg = s.cfg, s.rcfg
    return (
        rcfg.carry_over
        and not cfg.is_transformer
        and (s.interp == 0 or not s.cfg2.is_transformer)
        and s.use_fused_ce
        and rcfg.mc_samples == 0
        and not rcfg.xl_mems
        and os.environ.get("BAYESLM_PACKED_CARRY", "1") != "0"
    )


def nocarry_allowed(s) -> bool:
    rc = s.rcfg
    env = "BAYESLM_PACKED_TM" if s.is_tm else "BAYESLM_PACKED_NOCARRY"
    return (
        s.use_fused_ce
        and rc.mc_samples == 0
        and not rc.xl_mems
        and (s.interp == 0
             or s.cfg2.is_transformer == s.cfg.is_transformer)
        and os.environ.get(env, "1") != "0"
    )


# ------------------------------------------------------------ jit bodies
# -- sequence-PACKED transformer scoring: several hypotheses share one
# time-axis column (best-fit-decreasing bin packing), positions restart
# per segment, and attention is causal-within-segment via an additive
# (B, 1, T, T) mask. Removes the ~1.3-1.4x bucket-padding waste the
# per-hypothesis layout pays on every FFN/attention matmul, and compiles
# ONE shape instead of one per length bucket.
def tm_packed_impl(s, params, params2, m2, data, tgt, segs, positions,
                   n_seg: int, idx, seg, n_real):
    data = data.astype(jnp.int32)
    tgt = tgt.astype(jnp.int32)
    T = data.shape[1]
    tril = jnp.tril(jnp.ones((T, T), bool))
    eye = jnp.eye(T, dtype=bool)

    def body(_, inp):
        d, sg, pos = inp
        sq = sg.astype(jnp.int32).T  # (B, T)
        same = sq[:, :, None] == sq[:, None, :]
        # causal within one's own segment; padding (seg 0) rows attend
        # themselves so their (discarded) softmax stays finite
        valid = (same & tril[None]) | eye[None]
        m = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[:, None]
        h = s.model.apply(
            {"params": params}, d, deterministic=True, return_hidden=True,
            positions=pos.astype(jnp.int32), pack_mask=m,
        )
        if s.interp:
            h2 = s.model2.apply(
                {"params": params2}, d, deterministic=True,
                return_hidden=True,
                positions=pos.astype(jnp.int32), pack_mask=m,
            )
            return None, (h, h2)
        return None, h

    _, hs = jax.lax.scan(body, None, (data, segs, positions))
    hs2 = None
    if s.interp:
        hs, hs2 = hs
        hs2 = hs2.reshape(-1, hs2.shape[-1])
    return common.fused_scores_packed(
        s, params, hs.reshape(-1, hs.shape[-1]), tgt.reshape(-1),
        idx, seg, n_real, n_seg, hs2, m2,
    )


# -- the recurrent no-carry twin: independent hypotheses share packed
# columns with ZERO-state resets at segment starts (reset_src = -1
# builds an all-zero selection-matrix row in the Pallas reset kernels,
# so a reset reads zeros instead of a chain-source state).
def rnn_packed_impl(s, params, params2, m2, data, tgt, mask, reset,
                    n_seg: int, idx, seg, n_real):
    data = data.astype(jnp.int32)
    tgt = tgt.astype(jnp.int32)
    mask = mask.astype(jnp.float32)
    reset = reset.astype(jnp.float32)
    B = data.shape[2]
    cdtype = jnp.dtype(s.cfg.compute_dtype)
    h0 = init_hidden(s.cfg.nlayers, B, s.cfg.nhid, dtype=cdtype)
    src = jnp.full((B,), -1, jnp.int32)
    if s.interp:
        h0_2 = init_hidden(
            s.cfg2.nlayers, B, s.cfg2.nhid,
            dtype=jnp.dtype(s.cfg2.compute_dtype))

    def body(_, inp):
        d, m, r = inp
        h, _ = s.model.apply(
            {"params": params}, d, h0, deterministic=True,
            step_mask=m, reset_mask=r, reset_src=src, return_hidden=True,
        )
        if s.interp:
            h2, _ = s.model2.apply(
                {"params": params2}, d, h0_2, deterministic=True,
                step_mask=m, reset_mask=r, reset_src=src,
                return_hidden=True,
            )
            return None, (h, h2)
        return None, h

    _, hs = jax.lax.scan(body, None, (data, mask, reset))
    hs2 = None
    if s.interp:
        hs, hs2 = hs
        hs2 = hs2.reshape(-1, hs2.shape[-1])
    return common.fused_scores_packed(
        s, params, hs.reshape(-1, hs.shape[-1]), tgt.reshape(-1),
        idx, seg, n_real, n_seg, hs2, m2,
    )


# -- packed-time carry-over (see carry_allowed). Layout per chunk:
# ONE (T_pack, G*N) sequence; chain g's utterances occupy consecutive
# time segments of exact (max_hyp_len-capped) length; a reset event at
# each segment start replaces every column's recurrent state with its
# chain's column-0 state (= the previous utterance's FIRST hypothesis at
# its true length, held frozen by the step mask — exactly the
# reference's carry-over, :261-274). ~2-3x fewer sequential recurrence
# steps than per-utterance padded slots, and one kernel launch per
# layer per chunk instead of one per utterance.
def packed_carry_impl(s, params, params2, m2, data, tgt, mask, reset,
                      h1, h2, G: int, N: int, n_seg: int,
                      idx, seg, n_real):
    data = data.astype(jnp.int32)
    tgt = tgt.astype(jnp.int32)
    mask = mask.astype(jnp.float32)
    reset = reset.astype(jnp.float32)
    B = data.shape[1]

    # shape-agnostic over each carry leaf: the second (interpolation)
    # model may have a different nlayers/nhid geometry
    def bcast(c):
        def f(a):
            L_, G_, H_ = a.shape
            return jnp.broadcast_to(
                a[:, :, None, :], (L_, G_, N, H_)).reshape(L_, G_ * N, H_)
        return jax.tree.map(f, c)

    def first_hyp(nh):
        def f(a):
            L_, B_, H_ = a.shape
            return a.reshape(L_, B_ // N, N, H_)[:, :, 0, :]
        return jax.tree.map(f, nh)

    reset_src = (jnp.arange(B, dtype=jnp.int32) // N) * N
    hseq, nh = s.model.apply(
        {"params": params}, data, bcast(h1), deterministic=True,
        step_mask=mask, reset_mask=reset, reset_src=reset_src,
        return_hidden=True,
    )
    hseq2, nh2 = None, h2
    if s.interp:
        hseq2, nh2 = s.model2.apply(
            {"params": params2}, data, bcast(h2), deterministic=True,
            step_mask=mask, reset_mask=reset, reset_src=reset_src,
            return_hidden=True,
        )
        nh2 = first_hyp(nh2)
        hseq2 = hseq2.reshape(-1, hseq2.shape[-1])
    scores = common.fused_scores_packed(
        s, params, hseq.reshape(-1, hseq.shape[-1]), tgt.reshape(-1),
        idx, seg, n_real, n_seg, hseq2, m2,
    )
    return scores, first_hyp(nh), nh2


def plan_args_packed(s, T: int, G: int, N: int, plan):
    """Gather plan over packed-carry (T, G*N) batches. Mesh: chains
    split as contiguous column blocks of Gl = G/dp chains; indices,
    columns AND the packed segment ids ((u*G + g)*N + c) are
    re-localized per shard."""
    Gl = G // s._dp
    Bl = Gl * N
    B = G * N

    def localize(idx, seg):
        col = idx % B
        g = col // N
        u = seg // (G * N)
        c = seg % N
        return (g // Gl, (idx // B) * Bl + col,
                (u * Gl + g) * N + c, Bl, Gl * N)

    return common.split_plan(s, plan, T * Bl, localize)


# ------------------------------------------------------------ score fns
def score_carry_packed(s, nbest, word2idx, stream_fn=None, enc_all=None):
    rc = s.rcfg
    N = max((len(h) for h in nbest.values()), default=1)
    streams: "OrderedDict[str, list]" = OrderedDict()
    for k in nbest:
        label = stream_fn(k) if stream_fn else "_all"
        streams.setdefault(label, []).append(k)
    stream_keys = list(streams.values())
    # dp sharding splits g-major column blocks: pad with empty chains so
    # whole chains land on one shard (same convention as the slotted path)
    while len(stream_keys) % s._dp != 0:
        stream_keys.append([])
    G = len(stream_keys)
    Gl = G // s._dp  # per-shard chains (== G on a single device)
    U_total = max(len(sk) for sk in stream_keys)
    cap = rc.max_hyp_len
    cdtype = jnp.dtype(s.cfg.compute_dtype)
    carry = init_hidden(s.cfg.nlayers, G, s.cfg.nhid, dtype=cdtype)
    carry2 = None
    p2, m2 = None, None
    if s.interp:
        carry2 = init_hidden(
            s.cfg2.nlayers, G, s.cfg2.nhid,
            dtype=jnp.dtype(s.cfg2.compute_dtype))
        p2, m2 = s.params2, common.interp_m2(s)
    scores: Dict[tuple, float] = {}
    pending = []
    U_CHUNK = min(rc.carry_chunk_utts, U_total)
    for st in range(0, U_total, U_CHUNK):
        U = min(U_CHUNK, U_total - st)
        # pass 1: per-chain segment offsets (exact capped lengths)
        segs = {}  # (g, u) -> (key, t_off, segT)
        t_pack = 1
        for g, skeys in enumerate(stream_keys):
            off = 0
            for u in range(U):
                if st + u >= len(skeys):
                    continue
                k = skeys[st + u]
                segT = min(
                    max((len(x) for x, *_ in enc_all[k]), default=1), cap)
                segs[(g, u)] = (k, off, segT)
                off += segT
            t_pack = max(t_pack, off)
        T = -(-t_pack // 64) * 64  # coarse bucket: bounded compiles
        # pass 2: rows + reset events
        rows, t_offs, seg_ids = [], [], []
        reset_np = np.zeros((T, G * N), np.uint8)
        slot_key = {}
        for (g, u), (k, off, segT) in segs.items():
            if off > 0:
                reset_np[off, g * N : (g + 1) * N] = 1
            for c, (x, y, nc, _) in enumerate(enc_all[k]):
                if len(x) > segT:
                    x, y = x[:segT], y[:segT]
                rows.append((0, g * N + c, x, y, nc))
                t_offs.append(off)
                seg_ids.append((u * G + g) * N + c)
            slot_key[(u, g)] = k
        data, tgt, mask, _, plan = common.build_rows(
            s, rows, 1, T, G * N, want_ce_mask=False,
            t_offs=t_offs, seg_ids=seg_ids)
        idx, seg, n = plan_args_packed(s, T, G, N, plan)
        out, carry, carry2 = s._packed_step(
            s.params, p2, m2, jnp.asarray(data[0]), jnp.asarray(tgt[0]),
            jnp.asarray(mask[0]), jnp.asarray(reset_np), carry, carry2,
            Gl, N, U * Gl * N,
            idx, seg, n,
        )
        pending.append((out, slot_key, U))

    for out, slot_key, U in pending:
        # mesh: shard s holds chains [s*Gl, (s+1)*Gl) -> (dp, U, Gl, N)
        o = np.asarray(out).reshape(s._dp, U, Gl, N)
        for (u, g), k in slot_key.items():
            for i in range(len(nbest[k])):
                scores[(k, i)] = float(o[g // Gl, u, g % Gl, i])
    return common.assemble(nbest, scores)


def score_packed_nocarry(s, nbest, word2idx, stream_fn=None, enc_all=None):
    import bisect

    rc = s.rcfg
    items = []  # (key, idx, in_ids, tgt_ids, n_ctx)
    for key, hyps in nbest.items():
        for i, (x, y, nc, _) in enumerate(enc_all[key]):
            items.append((key, i, x, y, nc))
    if not items:
        return common.assemble(nbest, {})
    # same truncation as the bucketed path: the last bucket boundary is
    # max_hyp_len, so over-long hypotheses score their first max_hyp_len
    # tokens in both layouts
    cap = rc.max_hyp_len
    items = [(k, i, x[:cap], y[:cap], nc) for (k, i, x, y, nc) in items]
    T = max(128, -(-(rc.max_hyp_len + 2) // 64) * 64)
    # best-fit decreasing: place each hypothesis in the open column with
    # the smallest sufficient remaining capacity
    order = sorted(range(len(items)), key=lambda i: -len(items[i][2]))
    rems: list = []  # sorted (remaining, col)
    n_cols = 0
    place = {}  # item index -> (col, t_off, slot)
    fills = []  # per-col (used, n_slots)
    for i in order:
        L = min(len(items[i][2]), T)
        j = bisect.bisect_left(rems, (L, -1))
        if j < len(rems):
            r, col = rems.pop(j)
        else:
            r, col = T, n_cols
            n_cols += 1
            fills.append([0, 0])
        used, slot = fills[col]
        place[i] = (col, used, slot)
        fills[col] = [used + L, slot + 1]
        if r - L > 0:
            bisect.insort(rems, (r - L, col))
    # columns per device-call batch: ~6k real+pad tokens each (the
    # bucketed path's measured sweet spot at this geometry); under a
    # mesh, columns split across dp shards in contiguous blocks
    dp = s._dp
    Bc = max(8, -(-rc.batch_size * 24 // T // 8) * 8)
    Bc = -(-Bc // dp) * dp
    Bl = Bc // dp
    n = -(-n_cols // Bc)
    # per-shard item ranks: shard-local contiguous segment ids so each
    # shard's fused-CE segment_sum writes a dense (n_seg_l,) vector
    ranks, counts = [], [0] * dp
    for i in range(len(items)):
        s_ = (place[i][0] % Bc) // Bl
        ranks.append((s_, counts[s_]))
        counts[s_] += 1
    n_seg_l = -(-max(max(counts), 1) // 1024) * 1024  # bounded jit keys
    rows, t_offs, seg_ids = [], [], []
    if s.is_tm:
        segs_np = np.zeros((n, T, Bc), np.int16)
        pos_np = np.zeros((n, T, Bc), np.int16)
    else:
        rst_np = np.zeros((n, T, Bc), np.uint8)
    for i, it in enumerate(items):
        col, off, slot = place[i]
        r, c = col // Bc, col % Bc
        L = min(len(it[2]), T)
        rows.append((r, c, it[2], it[3], it[4]))
        t_offs.append(off)
        s_, k_ = ranks[i]
        seg_ids.append(s_ * n_seg_l + k_)
        if s.is_tm:
            segs_np[r, off : off + L, c] = slot + 1
            pos_np[r, off : off + L, c] = np.arange(L, dtype=np.int16)
        elif off > 0:
            rst_np[r, off, c] = 1  # zero-state reset at the segment start
    data, tgt, mask, _, plan = common.build_rows(
        s, rows, n, T, Bc, want_ce_mask=False,
        t_offs=t_offs, seg_ids=seg_ids)

    def localize(gidx, gseg):
        # columns split as contiguous blocks of Bl; segment ids are
        # already shard-major (s*n_seg_l + rank)
        col = gidx % Bc
        return (col // Bl, (gidx // Bc) * Bl + col, gseg, Bl, n_seg_l)

    idx, seg, n_real = common.split_plan(s, plan, n * T * Bl, localize)
    p2 = s.params2 if s.interp else None
    m2 = common.interp_m2(s)
    if s.is_tm:
        out = s._tm_packed_step(
            s.params, p2, m2, jnp.asarray(data), jnp.asarray(tgt),
            jnp.asarray(segs_np), jnp.asarray(pos_np), n_seg_l,
            idx, seg, n_real)
    else:
        out = s._rnn_packed_step(
            s.params, p2, m2, jnp.asarray(data), jnp.asarray(tgt),
            jnp.asarray(mask), jnp.asarray(rst_np), n_seg_l,
            idx, seg, n_real)
    out = np.asarray(out).reshape(dp, n_seg_l)
    scores = {}
    for i, it in enumerate(items):
        s_, k_ = ranks[i]
        scores[(it[0], it[1])] = float(out[s_, k_])
    return common.assemble(nbest, scores)
