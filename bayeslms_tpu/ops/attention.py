"""Multi-head self-attention ops.

Functional equivalents of the reference's self-built MultiheadAttention
(model.py:836-928): q scaled by head_dim^-0.5, additive causal mask, softmax,
attention-prob dropout, output projection. The reference materializes the
(B*h, T, T) score matrix with bmm; here the same math is expressed with
batched einsums that XLA fuses and tiles onto the MXU. Pallas flash
attention provides the fast paths: ops/attention_pallas.py (forward-only,
deterministic scoring/eval) and ops/attention_train_pallas.py (custom VJP
with in-kernel dropout, auto-enabled at long context).

Layout: time-major (T, B, E) to match the rest of the stack.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def causal_mask(T: int, dtype=jnp.float32) -> jax.Array:
    """Additive (T, T) mask: 0 on/below diagonal, -inf above (model.py:148-152)."""
    neg = jnp.asarray(-jnp.inf, dtype=dtype)
    return jnp.where(jnp.tril(jnp.ones((T, T), dtype=bool)), jnp.asarray(0, dtype), neg)


def multihead_attention(
    q: jax.Array,  # (T, B, E) already projected
    k: jax.Array,
    v: jax.Array,
    nhead: int,
    attn_mask: Optional[jax.Array] = None,  # (T, S) additive
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    causal: bool = False,
) -> jax.Array:
    """Core scaled-dot-product attention over time-major projections.

    ``causal=True`` + deterministic routes to the fused Pallas kernel —
    default ON (measured on v5e, E=512/8 heads/B=20: parity at T=100,
    1.46x at T=512, 2.27x at T=2048 vs the einsum path; opt out with
    BAYESLM_PALLAS_ATTN=0). Training keeps the differentiable einsum path.

    Masking contract: with ``causal=True`` and ``attn_mask=None`` this
    function owns the (implicit) causal mask — kernel routes are eligible.
    Passing an explicit ``attn_mask`` alongside ``causal=True`` (e.g. a
    causal+padding composite, or the NAS supernet pinning the einsum path
    for second-order differentiation) disables the Pallas routes, and the
    given mask is used as-is (it must already encode causality).
    """
    from .kernel_gate import pallas_allowed

    if causal and attn_mask is not None:
        pass  # explicit mask pins the einsum path (see docstring)
    elif causal and deterministic and pallas_allowed():
        import os

        if os.environ.get("BAYESLM_PALLAS_ATTN", "1") != "0":
            from .attention_pallas import causal_attention_pallas, pallas_attention_ok

            if pallas_attention_ok(q.shape[0], q.shape[2], nhead):
                return causal_attention_pallas(q, k, v, nhead)
    elif causal and not deterministic and pallas_allowed():
        # Differentiable flash attention with in-kernel dropout (custom VJP,
        # ops/attention_train_pallas.py). Measured in-model on v5e (full
        # train step, docs/ROUND2_NOTES.md): the kernel wins in isolation at
        # every T (5x at T=100) but LOSES inside the model at short T, where
        # XLA fuses the einsum attention into its neighbors (T=100: 16.7 vs
        # 14.7 ms; T=512: 23.3 vs 21.0) — and wins once the (B, h, T, T)
        # materializations dominate (T=2048: 37.3 vs 46.1 ms). Auto default:
        # kernel at T >= 1024. BAYESLM_PALLAS_ATTN_TRAIN=1/0 forces on/off.
        import os

        flag = os.environ.get("BAYESLM_PALLAS_ATTN_TRAIN", "auto")
        if flag == "1" or (flag != "0" and q.shape[0] >= 1024):
            from .attention_train_pallas import (
                flash_attention_train,
                flash_attn_train_ok,
            )

            if flash_attn_train_ok(q.shape[0], q.shape[2], nhead):
                rate = float(dropout_rate)
                if rate > 0.0:
                    seed = jax.random.randint(
                        dropout_rng, (1,), 0, 2**31 - 1, dtype=jnp.int32
                    )
                else:
                    seed = jnp.zeros((1,), jnp.int32)
                return flash_attention_train(q, k, v, nhead, rate, seed)
    T, B, E = q.shape
    S = k.shape[0]
    if attn_mask is None and causal:
        attn_mask = causal_mask(T)
    head_dim = E // nhead
    scaling = float(head_dim) ** -0.5

    # (T, B, E) -> (B, h, T, d)
    def split_heads(x, L):
        return x.reshape(L, B, nhead, head_dim).transpose(1, 2, 0, 3)

    qh = split_heads(q * scaling, T)
    kh = split_heads(k, S)
    vh = split_heads(v, S)

    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh, preferred_element_type=jnp.float32)
    if attn_mask is not None:
        scores = scores + attn_mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)

    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhts,bhsd->bhtd", probs, vh)
    # (B, h, T, d) -> (T, B, E)
    return out.transpose(2, 0, 1, 3).reshape(T, B, E)


def sinusoidal_positional_encoding(max_len: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """(max_len, d_model) sin/cos table (model.py:93-104)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe.astype(dtype)
