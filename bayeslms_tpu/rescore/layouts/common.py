"""Shared building blocks for the scoring layouts.

Host-side batch/plan construction (the vectorized row builder + gather-plan
packing) and the fused decode+CE helpers used by every layout, plus the two
per-batch jit bodies (`tm_scores`, `rnn_scores`) the slotted layouts scan
over. All functions take the `BatchScorer` as first argument — layouts are
stateless modules; the scorer object carries config, params and jitted
steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def masked_ce_sums(logits, targets, mask):
    """Per-column sum of token CE over real tokens: (T,B,V) -> (B,)."""
    V = logits.shape[-1]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, V), targets.reshape(-1)
    ).reshape(targets.shape)
    return (ce * mask).sum(axis=0)


def fused_scores(s, params, h, tgt, mask):
    from ...ops.ce_pallas import fused_decode_ce

    ce = fused_decode_ce(h, params["embedding"], params["decoder_b"], tgt)
    return (ce * mask).sum(axis=0)


def interp_m2(s):
    """Decoder-side constants for fused interpolated CE, built once.

    inter_flag=1 (logit interpolation, ref :157-163): the pre-scaled
    concatenated decoder ``concat(a*W1, (1-a)*W2)`` (V, D1+D2) + mixed
    bias, so the interpolated logits are one matmul over concatenated
    hiddens. Kept in float32 like the stored params; the CE kernel casts
    to the activation dtype per call (same as the single-model path).
    inter_flag=2 (score interpolation, `…copy.py`:244-264): just the
    second model's tied decoder."""
    if not s.interp:
        return None
    if s._m2_cache is None:
        a = float(s.rcfg.inter_alpha)
        W1, b1 = s.params["embedding"], s.params["decoder_b"]
        W2, b2 = s.params2["embedding"], s.params2["decoder_b"]
        if s.interp == 1:
            # scale in f32, store in the compute dtype: the CE kernel
            # casts emb to the activation dtype per call, so matching it
            # here makes that cast a no-op (skips a ~(V, D1+D2) HBM
            # round trip per device call at flagship geometry)
            Wcat = jnp.concatenate(
                [a * W1.astype(jnp.float32),
                 (1.0 - a) * W2.astype(jnp.float32)],
                axis=1).astype(jnp.dtype(s.cfg.compute_dtype))
            bmix = a * b1.astype(jnp.float32) + (1.0 - a) * b2.astype(
                jnp.float32)
            s._m2_cache = (Wcat, bmix)
        else:
            s._m2_cache = (W2, b2)
    return s._m2_cache


def fused_ce_tokens(s, params, m2, hsel, h2sel, tsel):
    """Per-token CE over gathered real positions; interpolation-aware."""
    from ...ops.ce_pallas import fused_decode_ce

    if s.interp == 1:
        hcat = jnp.concatenate([hsel, h2sel.astype(hsel.dtype)], axis=-1)
        return fused_decode_ce(hcat, m2[0], m2[1], tsel)
    if s.interp == 2:
        a = s.rcfg.inter_alpha
        ce1 = fused_decode_ce(
            hsel, params["embedding"], params["decoder_b"], tsel)
        ce2 = fused_decode_ce(
            h2sel.astype(hsel.dtype), m2[0], m2[1], tsel)
        return a * ce1 + (1.0 - a) * ce2
    return fused_decode_ce(
        hsel, params["embedding"], params["decoder_b"], tsel)


# -- padding-free decode: the vocabulary projection dominates rescoring
# cost and the padded (T_bucket, B) layout scores ~3-4x more tokens than
# exist. The host knows the masks, so it sends gather indices of the
# REAL CE positions (idx) and their per-hypothesis segment ids (seg);
# the kernel scores only those tokens and a segment-sum assembles
# per-hypothesis scores. Entries past ``n_real`` are padding (weight 0).
def fused_scores_packed(s, params, flat_h, flat_tgt, idx, seg, n_real,
                        n_seg: int, flat_h2=None, m2=None):
    hsel = jnp.take(flat_h, idx, axis=0)
    tsel = jnp.take(flat_tgt, idx, axis=0)
    h2sel = None if flat_h2 is None else jnp.take(flat_h2, idx, axis=0)
    ce = fused_ce_tokens(s, params, m2, hsel, h2sel, tsel)
    w = (jnp.arange(idx.shape[0]) < n_real).astype(ce.dtype)
    return jax.ops.segment_sum(ce * w, seg, num_segments=n_seg)


# -- vectorized host-side batch builder. The per-slot pad_batch loops +
# np.nonzero pack used to cost ~1/3 of a rescoring pass on a 1-core
# host; this builds the (R, T, C) batches AND the CE gather plan in a
# handful of numpy bulk ops, and ships compact dtypes (uint16 token ids
# when the vocab allows, uint8 step masks) — transfers ride a
# latency-bound tunnel, so bytes matter.
def build_rows(s, rows, R: int, T: int, C: int, want_ce_mask: bool,
               t_offs=None, seg_ids=None):
    """rows: list of (r, c, in_ids, tgt_ids, n_ctx) hypothesis slots.
    Returns (data, tgt, step_mask_u8, ce_mask_or_None, plan) where plan
    is the fused-decode gather plan (idx, seg, n_real) — None when the
    fused path is off and want_ce_mask instead yields a float32 mask
    that EXCLUDES spliced-context positions from the score.

    ``t_offs`` (per-row time offset) places each hypothesis at an
    arbitrary start step inside its (r, c) column — the packed-time
    carry layout. ``seg_ids`` overrides the default (r*C + c) score
    segment ids (needed when a column holds several hypotheses)."""
    n_h = len(rows)
    id_dtype = np.uint16 if s.cfg.vocab_size <= 0xFFFF else np.int32
    data = np.zeros((R * T * C,), id_dtype)
    tgt = np.zeros((R * T * C,), id_dtype)
    mask = np.zeros((R * T * C,), np.uint8)
    if n_h == 0:
        plan = None if want_ce_mask else pack_plan(
            np.zeros((0,), np.int64), np.zeros((0,), np.int64), R * T * C)
        return (data.reshape(R, T, C), tgt.reshape(R, T, C),
                mask.reshape(R, T, C),
                np.zeros((R, T, C), np.float32) if want_ce_mask else None,
                plan)
    lens = np.fromiter((min(len(r[2]), T) for r in rows), np.int64, count=n_h)
    tot = int(lens.sum())
    if isinstance(rows[0][2], np.ndarray):
        # native-encoded rows: slicing is a view, concatenate is one copy
        flat_in = np.concatenate([r[2][:L] for r, L in zip(rows, lens)])
        flat_tg = np.concatenate([r[3][:L] for r, L in zip(rows, lens)])
    else:
        flat_in = np.fromiter(
            (v for r, L in zip(rows, lens) for v in r[2][:L]),
            np.int64, count=tot)
        flat_tg = np.fromiter(
            (v for r, L in zip(rows, lens) for v in r[3][:L]),
            np.int64, count=tot)
    off = np.cumsum(lens) - lens
    # local_t: position WITHIN the hypothesis — the splice-context
    # exclusion below must use this, not the packed-layout-shifted
    # absolute time (t_offs), or context tokens placed at t_off>=n_ctx
    # would be scored
    local_t = np.arange(tot, dtype=np.int64) - np.repeat(off, lens)
    t_vec = local_t
    if t_offs is not None:
        t_vec = t_vec + np.repeat(np.asarray(t_offs, np.int64), lens)
    r_vec = np.repeat(np.fromiter((r[0] for r in rows), np.int64, n_h), lens)
    c_vec = np.repeat(np.fromiter((r[1] for r in rows), np.int64, n_h), lens)
    dest = (r_vec * T + t_vec) * C + c_vec
    data[dest] = flat_in
    tgt[dest] = flat_tg
    mask[dest] = 1
    nc_vec = np.repeat(np.fromiter((r[4] for r in rows), np.int64, n_h), lens)
    keep = local_t >= nc_vec  # context conditions the model, not the score
    ce_mask = None
    plan = None
    if want_ce_mask:
        cm = np.zeros((R * T * C,), np.float32)
        cm[dest[keep]] = 1.0
        ce_mask = cm.reshape(R, T, C)
    else:
        seg_vec = (
            (r_vec * C + c_vec) if seg_ids is None
            else np.repeat(np.asarray(seg_ids, np.int64), lens)
        )
        plan = pack_plan(dest[keep], seg_vec[keep], R * T * C)
    return (data.reshape(R, T, C), tgt.reshape(R, T, C),
            mask.reshape(R, T, C), ce_mask, plan)


def pack_plan(ce_dest, ce_seg, cap: int):
    """Pad a gather plan to a 4096-multiple bucket (bounded jit cache);
    entries past n_real are padding (segment 0, weight 0 on device)."""
    n = len(ce_dest)
    K = max(512, -(-n // 4096) * 4096) if n > 512 else 512
    K = min(max(K, n), max(cap, 1))
    idx = np.zeros((K,), np.int32)
    seg = np.zeros((K,), np.int32)
    idx[:n] = ce_dest
    seg[:n] = ce_seg
    return idx, seg, n


def split_plan(s, plan, cap_l: int, localize):
    """Device args for a gather plan. Single device: (idx, seg, n_real)
    as-is. Mesh: split the global plan into per-dp-shard local plans,
    pad each to the widest K, stack to (dp, K). ``localize(idx, seg)``
    returns (shard, lidx0, lseg0, idx_stride, seg_stride); shard s's
    local entries are lidx0 - s*idx_stride / lseg0 - s*seg_stride."""
    if s.mesh is None:
        idx, seg, n = plan
        return jnp.asarray(idx), jnp.asarray(seg), jnp.asarray(n, jnp.int32)
    idx, seg, n = plan
    idx, seg = idx[:n].astype(np.int64), seg[:n].astype(np.int64)
    shard, lidx0, lseg0, di, ds = localize(idx, seg)
    packs = []
    for sh in range(s._dp):
        m = shard == sh
        packs.append(pack_plan(lidx0[m] - sh * di, lseg0[m] - sh * ds, cap_l))
    K = max(p[0].shape[0] for p in packs)
    idx2 = np.zeros((s._dp, K), np.int32)
    seg2 = np.zeros((s._dp, K), np.int32)
    nn = np.zeros((s._dp,), np.int32)
    for sh, (i_, s_, n_) in enumerate(packs):
        idx2[sh, : len(i_)], seg2[sh, : len(s_)], nn[sh] = i_, s_, n_
    return jnp.asarray(idx2), jnp.asarray(seg2), jnp.asarray(nn)


def plan_args(s, data_shape, plan):
    """Gather plan over slotted (R, T, C) batches; mesh shards are
    contiguous column blocks of Cl = C/dp columns."""
    R, T, C = data_shape
    Cl = C // s._dp

    def localize(idx, seg):
        c = idx % C
        return (c // Cl, (idx // C) * Cl + c,
                (seg // C) * Cl + seg % C, Cl, Cl)

    return split_plan(s, plan, R * T * Cl, localize)


# ------------------------------------------------------------ jit bodies
def tm_scores(s, params, params2, data, tgt, mask):
    """One (T, B) transformer batch -> (B,) scores (XLA / legacy path;
    the fused path collects hiddens and decodes once per chunk)."""
    if s.use_fused_ce:
        h = s.model.apply(
            {"params": params}, data, deterministic=True, return_hidden=True
        )
        return fused_scores(s, params, h, tgt, mask)
    logits = s.model.apply({"params": params}, data, deterministic=True)
    if s.interp == 1:
        logits2 = s.model2.apply({"params": params2}, data, deterministic=True)
        a = s.rcfg.inter_alpha
        logits = a * logits + (1.0 - a) * logits2
        return masked_ce_sums(logits, tgt, mask)
    if s.interp == 2:
        logits2 = s.model2.apply({"params": params2}, data, deterministic=True)
        a = s.rcfg.inter_alpha
        return a * masked_ce_sums(logits, tgt, mask) + (
            1.0 - a) * masked_ce_sums(logits2, tgt, mask)
    return masked_ce_sums(logits, tgt, mask)


def rnn_scores(s, params, params2, data, tgt, step_mask, ce_mask, h1, h2):
    """``step_mask`` covers every REAL input position (context + hyp) so
    the recurrence processes them; ``ce_mask`` additionally excludes
    spliced-context positions from the score. They are identical unless
    context splicing is active."""
    if s.use_fused_ce:
        h, new_h1 = s.model.apply(
            {"params": params}, data, h1, deterministic=True,
            step_mask=step_mask, return_hidden=True,
        )
        return fused_scores(s, params, h, tgt, ce_mask), new_h1, h2
    logits, new_h1 = s.model.apply(
        {"params": params}, data, h1, deterministic=True, step_mask=step_mask
    )
    new_h2 = h2
    if s.interp == 1:
        logits2, new_h2 = s.model2.apply(
            {"params": params2}, data, h2, deterministic=True,
            step_mask=step_mask
        )
        a = s.rcfg.inter_alpha
        logits = a * logits + (1.0 - a) * logits2
        scores = masked_ce_sums(logits, tgt, ce_mask)
    elif s.interp == 2:
        logits2, new_h2 = s.model2.apply(
            {"params": params2}, data, h2, deterministic=True,
            step_mask=step_mask
        )
        a = s.rcfg.inter_alpha
        scores = a * masked_ce_sums(logits, tgt, ce_mask) + (
            1.0 - a
        ) * masked_ce_sums(logits2, tgt, ce_mask)
    else:
        scores = masked_ce_sums(logits, tgt, ce_mask)
    return scores, new_h1, new_h2


def assemble(nbest, scores):
    from collections import OrderedDict

    out = OrderedDict()
    for key, hyps in nbest.items():
        out[key] = [(hyp, scores[(key, i)]) for i, hyp in enumerate(hyps)]
    return out
