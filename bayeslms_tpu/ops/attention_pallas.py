"""Pallas TPU kernel: fused causal self-attention.

Fuses QK^T -> causal mask -> softmax -> PV into one kernel so the (T, S)
score matrix never round-trips through HBM (the XLA path materializes it per
head). Grid walks (batch*heads, q-blocks); K/V for the whole sequence sit in
VMEM per block — exact (not windowed) attention, sized for the LM regime
(T <= a few K). Padded tail rows/columns are handled by the causal mask:
padded columns are strictly future for every real row.

Forward-only: training keeps the differentiable XLA einsum path; eval and
the batched rescorer route here (ops/attention.py gates on
deterministic=True).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False

_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, bq: int):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (S, d)
    v = v_ref[0].astype(jnp.float32)  # (S, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, S)
    rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols <= rows, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq"))
def _run(q, k, v, scale: float, bq: int):
    BH, T, d = q.shape
    S = k.shape[1]
    grid = (BH, T // bq)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, T, d), q.dtype),
        interpret=_INTERPRET,
    )(q, k, v)


def causal_attention_pallas(
    q: jax.Array,  # (T, B, E) projected queries (unscaled)
    k: jax.Array,
    v: jax.Array,
    nhead: int,
) -> jax.Array:
    """Time-major causal MHA, fused. Returns (T, B, E)."""
    T, B, E = q.shape
    d = E // nhead
    scale = float(d) ** -0.5
    bq = min(128, _round_up(T, 8))
    T_pad = _round_up(T, bq)

    def to_heads(x):
        x = x.reshape(T, B, nhead, d).transpose(1, 2, 0, 3).reshape(B * nhead, T, d)
        if T_pad != T:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
        return x

    o = _run(to_heads(q), to_heads(k), to_heads(v), scale, bq)
    o = o[:, :T].reshape(B, nhead, T, d).transpose(2, 0, 1, 3).reshape(T, B, E)
    return o


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_attention_ok(T: int, E: int, nhead: int) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    d = E // nhead
    if d % 8 != 0:
        return False
    # whole-sequence K/V per block must fit VMEM comfortably
    return T <= 8192
