"""Pallas TPU kernel: fused tied-decoder + cross-entropy.

Scoring cost at AMI scale is dominated by the vocabulary projection: the XLA
path materializes (T, B, V~49k) logits in HBM (~1.3 GB per utterance batch at
bf16) and then reads them back for the CE reduction. This kernel computes

    ce[m] = logsumexp_v(h[m] . E[v] + b[v]) - (h[m] . E[t_m] + b[t_m])

directly from the hidden states with an online (running max / running
sum-exp) reduction over vocabulary tiles — the logits never exist in HBM.

Grid: (token-tiles, vocab-tiles), vocab innermost, so the per-token running
stats live in VMEM scratch across the vocab sweep. The token tile is kept
LARGE (bm=1024) so the full-embedding re-read per sweep — (M/bm) x V x D —
stays at or below the logits traffic the XLA path pays twice. VMEM budget at
bm=1024/bv=1024: h 2 MB + emb 2 MB (x2 buffers) + scores 4 MB + stats pads
to (bm, 128) 1.5 MB ~= 13.5 MB.

Forward-only: the batched rescorer and eval paths route here; training keeps
the XLA CE (autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False

# Scoped-VMEM ceiling requested from Mosaic (v5e has 128 MB VMEM/core; the
# default 16 MB cap is exceeded once the contraction dim grows past ~1024 —
# e.g. the fused INTERPOLATED decode concatenates both models' hiddens, so
# D = D1 + D2 = 2048 at the flagship geometry and the double-buffered
# (BM, D) + (BV, D) tiles alone need ~16.5 MB).
_VMEM_LIMIT = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

_BM = 1024  # token-tile rows
_BV = 1024  # vocab-tile columns


def _kernel(h_ref, emb_ref, bias_ref, tgt_ref, out_ref, m_scr, s_scr, t_scr):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        s_scr[:] = jnp.zeros_like(s_scr)
        t_scr[:] = jnp.zeros_like(t_scr)

    # dot in the input dtype (bf16 on the scoring path) with f32 accumulation
    scores = (
        jax.lax.dot_general(
            h_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0].astype(jnp.float32)
    )  # (BM, BV) f32

    # online logsumexp update
    m_old = m_scr[:]  # (BM, 1)
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
    s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(scores - m_new), axis=-1, keepdims=True
    )
    m_scr[:] = m_new

    # gather the target logit when it falls inside this vocab tile
    tloc = tgt_ref[:][:, :1] - j * scores.shape[1]  # (BM, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    hit = cols == tloc  # at most one true per row
    t_scr[:] = t_scr[:] + jnp.sum(jnp.where(hit, scores, 0.0), axis=-1, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        ce = jnp.log(s_scr[:]) + m_scr[:] - t_scr[:]  # (BM, 1)
        out_ref[:] = jnp.broadcast_to(ce, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("bm", "bv"))
def _run(h, emb, bias, tgt, bm: int, bv: int):
    M, D = h.shape
    V = emb.shape[0]
    grid = (M // bm, V // bv)  # tokens outer, vocab inner
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),  # running max
            pltpu.VMEM((bm, 1), jnp.float32),  # running sum-exp
            pltpu.VMEM((bm, 1), jnp.float32),  # target logit
        ],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(h, emb, bias, tgt)
    return out[:, 0]


def fused_decode_ce(h, emb, bias, targets):
    """Per-token CE from hidden states + tied decoder, fused.

    h: (..., D); emb: (V, D); bias: (V,); targets: (...) int32.
    Returns ce with the shape of ``targets`` (float32). Pads the token and
    vocab dimensions internally; padded vocab entries get -1e30 bias so they
    never win the softmax.
    """
    lead = targets.shape
    D = h.shape[-1]
    V = emb.shape[0]
    hf = h.reshape(-1, D)
    emb = emb.astype(h.dtype)
    tf = targets.reshape(-1).astype(jnp.int32)
    M = hf.shape[0]

    bm = _BM
    M_pad = _round_up(M, bm)
    V_pad = _round_up(V, _BV)
    if M_pad != M:
        hf = jnp.pad(hf, ((0, M_pad - M), (0, 0)))
        tf = jnp.pad(tf, (0, M_pad - M))
    if V_pad != V:
        emb = jnp.pad(emb, ((0, V_pad - V), (0, 0)))
        bias = jnp.pad(bias, (0, V_pad - V), constant_values=-1e30)

    tgt8 = jnp.broadcast_to(tf[:, None], (M_pad, 8))
    ce = _run(hf, emb, bias.reshape(1, V_pad), tgt8, bm, _BV)
    return ce[:M].reshape(lead)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# =====================================================================
# Training path: fused decode+CE with a custom VJP (ROUND1_NOTES item 2).
#
# The XLA training step materializes (M, V) logits THREE times in HBM
# (forward logits, softmax, dlogits) — ~75% of train-step FLOPs at 49k
# vocab run at ~30% of peak because of that traffic. Here:
#
#   forward : the online-logsumexp kernel, extended to also emit the
#             per-token (max, logsumexp) stats.
#   backward: two kernels that RECOMPUTE score tiles from the residuals
#             (flash-attention-style) instead of reading stored logits:
#     dh[m]  = g_m * sum_v (p_mv - hit_mv) E_v      (tokens outer, vocab inner)
#     dE[v]  = sum_m (g_m (p_mv - hit_mv)) h_m      (vocab outer, tokens inner)
#     db[v]  = sum_m  g_m (p_mv - hit_mv)
#   with p_mv = exp(score_mv - max_m) / sumexp_m from the saved stats.
#
# Matmul cost is 4*M*V*D vs XLA's ~3*M*V*D, but zero (M, V) HBM traffic.
# Accumulation is f32; the p-matmuls run in the hidden dtype (bf16 on TPU).
# =====================================================================


def _fwd_stats_kernel(h_ref, emb_ref, bias_ref, tgt_ref, out_ref, mout_ref,
                      sout_ref, m_scr, s_scr, t_scr):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        s_scr[:] = jnp.zeros_like(s_scr)
        t_scr[:] = jnp.zeros_like(t_scr)

    scores = (
        jax.lax.dot_general(
            h_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0].astype(jnp.float32)
    )

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
    s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(scores - m_new), axis=-1, keepdims=True
    )
    m_scr[:] = m_new

    tloc = tgt_ref[:][:, :1] - j * scores.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    hit = cols == tloc
    t_scr[:] = t_scr[:] + jnp.sum(jnp.where(hit, scores, 0.0), axis=-1, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        lse = jnp.log(s_scr[:]) + m_scr[:]
        out_ref[:] = jnp.broadcast_to(lse - t_scr[:], out_ref.shape)
        mout_ref[:] = jnp.broadcast_to(m_scr[:], mout_ref.shape)
        sout_ref[:] = jnp.broadcast_to(s_scr[:], sout_ref.shape)


def _bwd_dh_kernel(h_ref, emb_ref, bias_ref, tgt_ref, stat_ref, g_ref,
                   out_ref, acc_scr):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    scores = (
        jax.lax.dot_general(
            h_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0].astype(jnp.float32)
    )
    m = stat_ref[:][:, :1]
    s = stat_ref[:][:, 8:9]
    p = jnp.exp(scores - m) / s

    tloc = tgt_ref[:][:, :1] - j * scores.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # per-token cotangent coefficients: a on the softmax term, b on the
    # target hit (single chip: a=g, b=-g; vocab-sharded: the outer
    # logsumexp-merge's exact cotangents)
    a = g_ref[:][:, :1]
    b = g_ref[:][:, 8:9]
    d = a * p + b * (cols == tloc).astype(jnp.float32)

    acc_scr[:] = acc_scr[:] + jnp.dot(
        d.astype(emb_ref.dtype), emb_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(j == nv - 1)
    def _():
        out_ref[:] = acc_scr[:].astype(out_ref.dtype)


def _bwd_de_kernel(h_ref, emb_ref, bias_ref, tgt_ref, stat_ref, g_ref,
                   de_ref, db_ref, acc_scr, accb_scr):
    i = pl.program_id(1)  # token tiles INNER so dE accumulates in VMEM
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        accb_scr[:] = jnp.zeros_like(accb_scr)

    scores = (
        jax.lax.dot_general(
            h_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0].astype(jnp.float32)
    )
    m = stat_ref[:][:, :1]
    s = stat_ref[:][:, 8:9]
    p = jnp.exp(scores - m) / s

    j = pl.program_id(0)
    tloc = tgt_ref[:][:, :1] - j * scores.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    a = g_ref[:][:, :1]
    b = g_ref[:][:, 8:9]
    gp = a * p + b * (cols == tloc).astype(jnp.float32)  # (bm, bv) f32

    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        gp.astype(h_ref.dtype), h_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    accb_scr[:] = accb_scr[:] + jnp.sum(gp, axis=0, keepdims=True)

    @pl.when(i == ni - 1)
    def _():
        de_ref[:] = acc_scr[:]
        db_ref[:] = accb_scr[:]


@functools.partial(jax.jit, static_argnames=("bm", "bv"))
def _run_fwd_stats(h, emb, bias, tgt, bm: int, bv: int):
    M, D = h.shape
    V = emb.shape[0]
    grid = (M // bm, V // bv)
    shp = jax.ShapeDtypeStruct((M, 8), jnp.float32)
    ce, mx, se = pl.pallas_call(
        _fwd_stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[shp, shp, shp],
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(h, emb, bias, tgt)
    return ce[:, 0], mx[:, 0], se[:, 0]


@functools.partial(jax.jit, static_argnames=("bm", "bv"))
def _run_bwd_dh(h, emb, bias, tgt, stats, g, bm: int, bv: int):
    M, D = h.shape
    V = emb.shape[0]
    grid = (M // bm, V // bv)
    return pl.pallas_call(
        _bwd_dh_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), h.dtype),
        scratch_shapes=[pltpu.VMEM((bm, D), jnp.float32)],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(h, emb, bias, tgt, stats, g)


@functools.partial(jax.jit, static_argnames=("bm", "bv"))
def _run_bwd_de(h, emb, bias, tgt, stats, g, bm: int, bv: int):
    M, D = h.shape
    V = emb.shape[0]
    grid = (V // bv, M // bm)  # vocab OUTER, tokens inner
    return pl.pallas_call(
        _bwd_de_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, D), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 8), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 16), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 16), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bv, D), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, D), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bv, D), jnp.float32),
            pltpu.VMEM((1, bv), jnp.float32),
        ],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(h, emb, bias, tgt, stats, g)


def _pad_inputs(h, emb, bias, targets, bm, bv):
    D = h.shape[-1]
    V = emb.shape[0]
    hf = h.reshape(-1, D)
    tf = targets.reshape(-1).astype(jnp.int32)
    M = hf.shape[0]
    M_pad = _round_up(M, bm)
    V_pad = _round_up(V, bv)
    if M_pad != M:
        hf = jnp.pad(hf, ((0, M_pad - M), (0, 0)))
        tf = jnp.pad(tf, (0, M_pad - M))
    embp, biasp = emb.astype(h.dtype), bias
    if V_pad != V:
        embp = jnp.pad(embp, ((0, V_pad - V), (0, 0)))
        biasp = jnp.pad(bias, (0, V_pad - V), constant_values=-1e30)
    return hf, embp, biasp.reshape(1, V_pad), tf, M, V_pad


@jax.custom_vjp
def fused_decode_ce_train(h, emb, bias, targets):
    """Differentiable fused decode+CE: like fused_decode_ce but with a
    custom VJP whose backward recomputes score tiles instead of storing
    (M, V) logits. Grads flow to h, emb, bias."""
    hf, embp, biasp, tf, M, V_pad = _pad_inputs(h, emb, bias, targets, _BM_TRAIN, _BV)
    tgt8 = jnp.broadcast_to(tf[:, None], (tf.shape[0], 8))
    ce, _, _ = _run_fwd_stats(hf, embp, biasp, tgt8, _BM_TRAIN, _BV)
    return ce[:M].reshape(targets.shape)


def _fdc_fwd(h, emb, bias, targets):
    hf, embp, biasp, tf, M, V_pad = _pad_inputs(h, emb, bias, targets, _BM_TRAIN, _BV)
    tgt8 = jnp.broadcast_to(tf[:, None], (tf.shape[0], 8))
    ce, mx, se = _run_fwd_stats(hf, embp, biasp, tgt8, _BM_TRAIN, _BV)
    res = (h, emb, bias, targets, mx, se)
    return ce[:M].reshape(targets.shape), res


def _fdc_bwd(res, g):
    h, emb, bias, targets, mx, se = res
    hf, embp, biasp, tf, M, V_pad = _pad_inputs(h, emb, bias, targets, _BM_TRAIN, _BV)
    M_pad = hf.shape[0]
    gf = jnp.pad(g.reshape(-1).astype(jnp.float32), (0, M_pad - M))
    tgt8 = jnp.broadcast_to(tf[:, None], (M_pad, 8))
    # cotangent coefficients packed (bm, 16): cols 0-7 a (softmax term),
    # cols 8-15 b (target-hit term); CE grad is a=g, b=-g
    g16 = jnp.concatenate(
        [jnp.broadcast_to(gf[:, None], (M_pad, 8)),
         jnp.broadcast_to(-gf[:, None], (M_pad, 8))], axis=1
    )
    # stats packed (bm, 16): cols 0-7 max, cols 8-15 sumexp
    stats = jnp.concatenate(
        [jnp.broadcast_to(mx[:, None], (M_pad, 8)),
         jnp.broadcast_to(se[:, None], (M_pad, 8))], axis=1
    )
    dh = _run_bwd_dh(hf, embp, biasp, tgt8, stats, g16, _BM_TRAIN, _BV)
    # dE holds a (bv, D) f32 accumulator + (bv, D) f32 output block in VMEM;
    # bv=1024 at D=1024 blows the 16 MB budget (measured 18 MB) — halve it.
    de, db = _run_bwd_de(hf, embp, biasp, tgt8, stats, g16, _BM_TRAIN,
                         min(_BV_DE, _BV))
    V, D = emb.shape
    dh = dh[:M].reshape(h.shape).astype(h.dtype)
    de = de[:V].astype(emb.dtype)
    db = db[0, :V].astype(bias.dtype)
    return dh, de, db, None


fused_decode_ce_train.defvjp(_fdc_fwd, _fdc_bwd)

_BM_TRAIN = 512  # token-tile rows for the train kernels (dh acc is (bm, D) f32)
_BV_DE = 512  # vocab-tile columns for the dE kernel (f32 acc + out in VMEM)


# =====================================================================
# Multi-chip training path (shard_map): vocab-sharded fused decode+CE.
#
# Under a (dp, tp) mesh the decoder/embedding is vocab-sharded (mesh.py
# param rules) and the XLA CE lets GSPMD partition the softmax — but each
# chip still materializes its (M, V/tp) logit shard three times in HBM.
# Here each shard runs the SAME fused kernels on its local vocab slice and
# returns per-token partials
#
#   lse_k = log sum_{v in shard k} exp(score_v)     t_k = target logit
#                                                         (0 off-shard)
#
# stacked over the vocab axis; the global softmax is stitched OUTSIDE the
# shard_map as ce = logsumexp_k(lse_k) - sum_k t_k (a tiny (tp, T, B) XLA
# reduction — the scaling-book reduce-don't-gather recipe). Keeping the
# collectives outside the custom VJP makes the transpose exact: autodiff
# of the merge delivers each shard's cotangents (d_lse = g*softmax weight,
# d_t = -g), which the backward kernels consume directly via their
# (a, b)-coefficient form d = a*p_local + b*hit. dE/db stay shard-local;
# dh partials are summed by shard_map's own transpose. The (M, V) logits
# never exist — per chip OR gathered.
#
# With tp=1 this degenerates to per-dp-shard single-chip fused CE, so the
# measured single-chip win extends to data-parallel meshes unchanged.
# =====================================================================


@jax.custom_vjp
def _shard_lse_t(h, emb, bias, tgt_adj):
    """Per-shard (lse, target-logit) over the LOCAL vocab slice.

    tgt_adj: shard-local target ids, -1 when the target is off-shard.
    Returns two (M,) f32 vectors, M = number of tokens in h.
    """
    out, _ = _shard_lse_t_fwd(h, emb, bias, tgt_adj)
    return out


def _shard_lse_t_fwd(h, emb, bias, tgt_adj):
    hf, embp, biasp, tf, M, _ = _pad_inputs(h, emb, bias, tgt_adj, _BM_TRAIN, _BV)
    tgt8 = jnp.broadcast_to(tf[:, None], (tf.shape[0], 8))
    ce_loc, mx, se = _run_fwd_stats(hf, embp, biasp, tgt8, _BM_TRAIN, _BV)
    lse = jnp.log(se) + mx
    t = lse - ce_loc  # 0 when the target is off-shard
    return (lse[:M], t[:M]), (h, emb, bias, tgt_adj, mx, se)


def _shard_lse_t_bwd(res, cts):
    h, emb, bias, tgt_adj, mx, se = res
    d_lse, d_t = cts
    hf, embp, biasp, tf, M, _ = _pad_inputs(h, emb, bias, tgt_adj, _BM_TRAIN, _BV)
    M_pad = hf.shape[0]
    a = jnp.pad(d_lse.reshape(-1).astype(jnp.float32), (0, M_pad - M))
    b = jnp.pad(d_t.reshape(-1).astype(jnp.float32), (0, M_pad - M))
    tgt8 = jnp.broadcast_to(tf[:, None], (M_pad, 8))
    g16 = jnp.concatenate(
        [jnp.broadcast_to(a[:, None], (M_pad, 8)),
         jnp.broadcast_to(b[:, None], (M_pad, 8))], axis=1
    )
    stats = jnp.concatenate(
        [jnp.broadcast_to(mx[:, None], (M_pad, 8)),
         jnp.broadcast_to(se[:, None], (M_pad, 8))], axis=1
    )
    dh = _run_bwd_dh(hf, embp, biasp, tgt8, stats, g16, _BM_TRAIN, _BV)
    de, db = _run_bwd_de(hf, embp, biasp, tgt8, stats, g16, _BM_TRAIN,
                         min(_BV_DE, _BV))
    V, D = emb.shape
    dh = dh[:M].reshape(h.shape).astype(h.dtype)
    de = de[:V].astype(emb.dtype)
    db = db[0, :V].astype(bias.dtype)
    return dh, de, db, None


_shard_lse_t.defvjp(_shard_lse_t_fwd, _shard_lse_t_bwd)


def fused_decode_ce_train_spmd(h, emb, bias, targets, mesh, *,
                               vocab_axis: str = "tp", batch_axis: str = "dp"):
    """Differentiable fused decode+CE over a (dp, tp) mesh.

    h: (T, B, D) batch-sharded over ``batch_axis``; emb: (V, D) and bias:
    (V,) vocab-sharded over ``vocab_axis``; targets: (T, B) int. Returns
    per-token CE (T, B) batch-sharded. V must divide by the vocab-axis size.
    """
    from jax.sharding import PartitionSpec as P

    T, B = targets.shape

    def body(hh, ee, bb, tt):
        v_loc = ee.shape[0]
        off = jax.lax.axis_index(vocab_axis) * v_loc
        tl = tt.astype(jnp.int32) - off
        # off-shard targets -> -1 sentinel (never hits); without this a
        # target from a HIGHER shard can land inside this shard's padded
        # vocab tile and pick up its -1e30 padding score
        tl = jnp.where((tl >= 0) & (tl < v_loc), tl, -1)
        lse, t = _shard_lse_t(hh, ee, bb, tl)
        b_loc = tt.shape[1]
        return lse.reshape(1, T, b_loc), t.reshape(1, T, b_loc)

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, batch_axis, None), P(vocab_axis, None),
                  P(vocab_axis), P(None, batch_axis)),
        out_specs=(P(vocab_axis, None, batch_axis),
                   P(vocab_axis, None, batch_axis)),
        check_vma=False,
    )
    lse_k, t_k = f(h, emb, bias, targets)  # (tp, T, B) partials
    return jax.nn.logsumexp(lse_k, axis=0) - t_k.sum(axis=0)


def fused_ce_ok(D: int) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon") and D % 128 == 0
