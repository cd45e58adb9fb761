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


def fused_ce_ok(D: int) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon") and D % 128 == 0
