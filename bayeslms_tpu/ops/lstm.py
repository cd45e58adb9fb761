"""Recurrent cores as XLA scans, TPU-first.

Design (replaces the reference's cuDNN `_VF.lstm` fused kernel,
model.py:14-20, and the per-timestep python loops at model.py:1734-1742,
:2503-2513):

- The input projection ``x @ W_ih^T + b`` for the WHOLE sequence is hoisted
  out of the recurrence into one large (T*B, in) x (in, 4H) matmul that tiles
  onto the MXU.
- Only the hidden-to-hidden matmul runs inside ``lax.scan``; weights are loop
  invariants so XLA keeps a single copy and the recurrence compiles to a
  tight on-device loop (no per-step dispatch, no host syncs).
- Gate order follows torch LSTM convention [i, f, g, o] along the 4H axis so
  the Bayesian gate-slice positions 1-4 (model.py:472-485) map one-to-one.

Weight shapes use the torch layout — W: (4H, in), applied as x @ W^T — so
checkpoints can round-trip with reference state dicts.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class LSTMParams(NamedTuple):
    """One layer of LSTM weights (torch layout)."""

    w_ih: jax.Array  # (4H, in)
    w_hh: jax.Array  # (4H, H)
    b_ih: jax.Array  # (4H,)
    b_hh: jax.Array  # (4H,)


def _split4(gates):
    return jnp.split(gates, 4, axis=-1)


def lstm_cell_step(h, c, xg_t, w_hh_t, b_hh):
    """One LSTM step given the precomputed input projection ``xg_t``.

    xg_t already contains x @ W_ih^T + b_ih; b_hh is added here (torch keeps
    two bias vectors for cuDNN compatibility; both are used).
    """
    gates = xg_t + h @ w_hh_t + b_hh
    i, f, g, o = _split4(gates)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _apply_reset(state, r_t, reset_src):
    """At packed utterance boundaries, replace each column's state with its
    reset source column's state (the chain's first hypothesis, whose frozen
    state is the exact carry-over state at its true length). Source -1 means
    ZERO state (independent segments, the no-carry packed layout) — the
    Pallas kernels get this for free because a -1 source builds an all-zero
    selection-matrix row."""
    r = r_t[:, None].astype(state.dtype)
    src = jnp.take(state, jnp.maximum(reset_src, 0), axis=0)
    src = src * (reset_src >= 0).astype(state.dtype)[:, None]
    return (1.0 - r) * state + r * src


def lstm_layer(
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    p: LSTMParams,
    unroll: int = 8,
    step_mask: Optional[jax.Array] = None,
    allow_pallas: bool = False,
    reset_mask: Optional[jax.Array] = None,
    reset_src: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-layer LSTM over a (T, B, in) sequence -> (T, B, H), hT, cT.

    ``step_mask`` (T, B) freezes the carried state on padded steps: at masked
    positions the previous (h, c) is kept, so the FINAL state equals the
    state at each stream's true length. This is what lets the batched N-best
    rescorer keep exact per-hypothesis hidden carry-over over padded,
    length-bucketed batches.

    ``reset_mask`` (T, B) + ``reset_src`` (B,) implement the packed-time
    carry-over layout: BEFORE processing step t, columns with reset 1 take
    the state of column ``reset_src[b]`` (their chain's first hypothesis).
    This lets a whole serial utterance chain run as ONE time-packed sequence
    with per-utterance exact lengths instead of per-utterance padded slots.

    ``allow_pallas`` routes forward-only calls (eval/scoring) to the fused
    Pallas recurrence with VMEM-resident W_hh when available — default ON
    (+23% rescoring throughput on TPU v5e); opt out with
    BAYESLM_PALLAS_LSTM=0. Grad paths must keep the scan.
    """
    import os

    from .kernel_gate import pallas_allowed

    if allow_pallas and pallas_allowed():
        from .lstm_pallas import lstm_layer_pallas, pallas_lstm_ok

        if os.environ.get("BAYESLM_PALLAS_LSTM", "1") != "0" and pallas_lstm_ok(
            p.w_hh.shape[1], x.dtype, batch=x.shape[1]
        ):
            return lstm_layer_pallas(
                x, h0, c0, p.w_ih, p.w_hh, p.b_ih, p.b_hh, step_mask,
                reset_mask=reset_mask, reset_src=reset_src,
            )
    elif pallas_allowed():
        # Grad path: the custom-VJP fused recurrence keeps W_hh and the
        # (dh, dc) carries VMEM-resident through a reverse-time kernel.
        from .lstm_pallas import lstm_layer_pallas_train, pallas_lstm_ok

        if reset_mask is None and os.environ.get(
            "BAYESLM_PALLAS_LSTM_TRAIN", "1"
        ) != "0" and pallas_lstm_ok(
            p.w_hh.shape[1], x.dtype, batch=x.shape[1], train=True
        ):
            return lstm_layer_pallas_train(
                x, h0, c0, p.w_ih, p.w_hh, p.b_ih, p.b_hh, step_mask
            )
    dtype = x.dtype
    w_ih_t = p.w_ih.T.astype(dtype)  # (in, 4H)
    w_hh_t = p.w_hh.T.astype(dtype)  # (H, 4H)
    b_ih = p.b_ih.astype(dtype)
    b_hh = p.b_hh.astype(dtype)

    T, B, _ = x.shape
    xg = (x.reshape(T * B, -1) @ w_ih_t + b_ih).reshape(T, B, -1)

    def step(carry, inp):
        h, c = carry
        xg_t = inp[0]
        i = 1
        if step_mask is not None:
            m_t = inp[i]
            i += 1
        if reset_mask is not None:
            r_t = inp[i]
            h = _apply_reset(h, r_t, reset_src)
            c = _apply_reset(c, r_t, reset_src)
        if step_mask is None:
            h, c = lstm_cell_step(h, c, xg_t, w_hh_t, b_hh)
        else:
            hn, cn = lstm_cell_step(h, c, xg_t, w_hh_t, b_hh)
            keep = m_t[:, None].astype(h.dtype)
            h = keep * hn + (1.0 - keep) * h
            c = keep * cn + (1.0 - keep) * c
        return (h, c), h

    xs = (xg,)
    if step_mask is not None:
        xs = xs + (step_mask,)
    if reset_mask is not None:
        xs = xs + (reset_mask,)
    (hT, cT), ys = lax.scan(step, (h0.astype(dtype), c0.astype(dtype)), xs, unroll=unroll)
    return ys, hT, cT


def _masked(step_mask, h_old, h_new, m_t):
    keep = m_t[:, None].astype(h_new.dtype)
    return keep * h_new + (1.0 - keep) * h_old


def gru_layer(x, h0, p: LSTMParams, unroll: int = 8, step_mask: Optional[jax.Array] = None,
              reset_mask: Optional[jax.Array] = None, reset_src: Optional[jax.Array] = None):
    """Single-layer GRU (torch gate order r, z, n) -> (T, B, H), hT."""
    dtype = x.dtype
    w_ih_t = p.w_ih.T.astype(dtype)
    w_hh_t = p.w_hh.T.astype(dtype)
    b_ih = p.b_ih.astype(dtype)
    b_hh = p.b_hh.astype(dtype)

    T, B, _ = x.shape
    xg = (x.reshape(T * B, -1) @ w_ih_t + b_ih).reshape(T, B, -1)

    def step(h, inp):
        xg_t, m_t = inp[0], inp[1]
        if reset_mask is not None:
            h = _apply_reset(h, inp[2], reset_src)
        hg = h @ w_hh_t + b_hh
        xr, xz, xn = jnp.split(xg_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        hn_ = (1.0 - z) * n + z * h
        h = _masked(step_mask, h, hn_, m_t) if step_mask is not None else hn_
        return h, h

    ms = step_mask if step_mask is not None else jnp.ones((T, B), dtype)
    xs = (xg, ms) if reset_mask is None else (xg, ms, reset_mask)
    hT, ys = lax.scan(step, h0.astype(dtype), xs, unroll=unroll)
    return ys, hT


def rnn_layer(
    x, h0, p: LSTMParams, nonlinearity: str = "tanh", unroll: int = 8,
    step_mask: Optional[jax.Array] = None,
    reset_mask: Optional[jax.Array] = None, reset_src: Optional[jax.Array] = None,
):
    """Vanilla RNN layer (tanh or relu)."""
    dtype = x.dtype
    act = jnp.tanh if nonlinearity == "tanh" else jax.nn.relu
    w_ih_t = p.w_ih.T.astype(dtype)
    w_hh_t = p.w_hh.T.astype(dtype)
    T, B, _ = x.shape
    xg = (x.reshape(T * B, -1) @ w_ih_t + p.b_ih.astype(dtype)).reshape(T, B, -1)
    ms = step_mask if step_mask is not None else jnp.ones((T, B), dtype)

    def step(h, inp):
        xg_t, m_t = inp[0], inp[1]
        if reset_mask is not None:
            h = _apply_reset(h, inp[2], reset_src)
        hn_ = act(xg_t + h @ w_hh_t + p.b_hh.astype(dtype))
        h = _masked(step_mask, h, hn_, m_t) if step_mask is not None else hn_
        return h, h

    xs = (xg, ms) if reset_mask is None else (xg, ms, reset_mask)
    hT, ys = lax.scan(step, h0.astype(dtype), xs, unroll=unroll)
    return ys, hT


def custom_cell_scan(
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    step_fn: Callable,
    per_step: Optional[jax.Array] = None,
    unroll: int = 1,
):
    """Scan an arbitrary cell ``step_fn((h, c), x_t, extra_t) -> (h, c)``.

    Used by the GP-LSTM and Variational-LSTM cells whose gate substitution /
    noise injection doesn't fit the fused fast path. ``per_step`` carries
    per-timestep auxiliary input (e.g. pre-drawn VNN noise (T, 1, H)).
    Replaces the reference's python per-timestep loops (model.py:1734-1742,
    :2503-2513) with a compiled on-device loop.
    """
    xs = (x, per_step) if per_step is not None else (x,)

    def body(carry, inp):
        hc = step_fn(carry, *inp)
        return hc, hc[0]

    (hT, cT), ys = lax.scan(body, (h0, c0), xs, unroll=unroll)
    return ys, hT, cT


def lstm_stack2(
    x: jax.Array,
    h0: jax.Array,   # (2, B, H)
    c0: jax.Array,   # (2, B, H)
    p1: LSTMParams,
    p2: LSTMParams,
    unroll: int = 8,
    step_mask: Optional[jax.Array] = None,
    allow_pallas: bool = False,
    reset_mask: Optional[jax.Array] = None,
    reset_src: Optional[jax.Array] = None,
    dropout_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Two stacked LSTM layers, fused into ONE sequential Pallas grid when
    available: halves the sequential grid-iteration count vs two per-layer
    kernels, keeps the inter-layer activation in VMEM (no (T, B, H) HBM
    round-trip), and runs layer 2's input projection against a VMEM-resident
    W_ih2 (the reference's hot path is a 2-layer `_VF.lstm`, model.py:41-46).
    Falls back to two ``lstm_layer`` calls (which themselves route to the
    single-layer kernels or the XLA scan). Opt out: BAYESLM_PALLAS_LSTM2=0.

    ``dropout_mask`` (T, B, H): inter-layer inverted-dropout mask applied to
    layer 1's output (torch nn.LSTM semantics); grad paths only.

    Measured on v5e (H=1024): scoring (B=200) +15% — the halved launch count
    and VMEM-resident inter-layer activation win. Training (B=32) is 2-5%
    SLOWER fused: moving layer 2's input projection in-kernel runs it at
    32/128 MXU rows instead of one full-width (T*B, H) matmul, and the
    recurrence is latency-bound regardless (docs/ROOFLINE.md). The train
    route is therefore opt-IN via BAYESLM_PALLAS_LSTM2_TRAIN=1.

    Returns (ys2, (hT1, hT2), (cT1, cT2)).
    """
    import os

    from .kernel_gate import pallas_allowed

    H = p1.w_hh.shape[1]
    if (
        os.environ.get("BAYESLM_PALLAS_LSTM2", "1") != "0"
        and pallas_allowed()
        and p2.w_ih.shape == (4 * H, H)
    ):
        from .lstm_pallas import (
            lstm2_layer_pallas, lstm2_layer_pallas_train, pallas_lstm2_ok,
        )

        if allow_pallas and dropout_mask is None \
                and os.environ.get("BAYESLM_PALLAS_LSTM", "1") != "0" \
                and pallas_lstm2_ok(H, x.dtype, batch=x.shape[1]):
            return lstm2_layer_pallas(
                x, h0[0], c0[0], h0[1], c0[1],
                p1.w_ih, p1.w_hh, p1.b_ih, p1.b_hh,
                p2.w_ih, p2.w_hh, p2.b_ih, p2.b_hh,
                step_mask, reset_mask, reset_src,
            )
        if (not allow_pallas) and reset_mask is None \
                and os.environ.get("BAYESLM_PALLAS_LSTM2_TRAIN", "0") == "1" \
                and os.environ.get("BAYESLM_PALLAS_LSTM_TRAIN", "1") != "0" \
                and pallas_lstm2_ok(H, x.dtype, batch=x.shape[1], train=True):
            return lstm2_layer_pallas_train(
                x, h0[0], c0[0], h0[1], c0[1],
                p1.w_ih, p1.w_hh, p1.b_ih, p1.b_hh,
                p2.w_ih, p2.w_hh, p2.b_ih, p2.b_hh,
                step_mask, dropout_mask,
            )
    ys1, h1T, c1T = lstm_layer(
        x, h0[0], c0[0], p1, unroll, step_mask, allow_pallas,
        reset_mask, reset_src,
    )
    if dropout_mask is not None:
        ys1 = ys1 * dropout_mask.astype(ys1.dtype)
    ys2, h2T, c2T = lstm_layer(
        ys1, h0[1], c0[1], p2, unroll, step_mask, allow_pallas,
        reset_mask, reset_src,
    )
    return ys2, (h1T, h2T), (c1T, c2T)
