#!/usr/bin/env python
"""Pallas causal attention vs the XLA einsum path on the real TPU chip
(VERDICT round-1 item 7: measure, then default-on or delete the gate).

Eval-mode geometry (deterministic, no dropout): E=512, 8 heads (the AMI
Transformer recipe), batch 20, T in {100, 512, 2048}.

Run: python tools/tpu_attn_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, n1=10, n2=410):
    """Per-iteration time of fn via TWO in-jit dependency-chained loops of
    different lengths: per-iter = (t(n2) - t(n1)) / (n2 - n1). This cancels
    the fixed ~40 ms relay/fetch overhead, and warm-up completion is forced
    with a SCALAR FETCH (block_until_ready returns early through the axon
    relay and would leak compile time into the timed region)."""

    def timed(iters):
        @jax.jit
        def loop(q, k, v):
            def body(_, carry):
                o = fn(carry, k, v)
                return carry + jnp.asarray(1e-6, carry.dtype) * o

            return jax.lax.fori_loop(0, iters, body, q)

        float(jnp.sum(loop(*args)[0, 0].astype(jnp.float32)))  # compile+sync
        t0 = time.perf_counter()
        float(jnp.sum(loop(*args)[0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    from bayeslms_tpu.ops.attention import causal_mask, multihead_attention
    from bayeslms_tpu.ops.attention_pallas import causal_attention_pallas

    E, H, B = 512, 8, 20
    print("platform:", jax.devices()[0].platform, flush=True)
    for T in (100, 512, 2048):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32)).astype(jnp.bfloat16)
        mask = causal_mask(T)

        xla = lambda q, k, v: multihead_attention(q, k, v, H, mask, causal=False)
        pal = lambda q, k, v: causal_attention_pallas(q, k, v, H)

        # correctness first
        a = np.asarray(jax.jit(xla)(q, k, v), np.float32)
        b = np.asarray(jax.jit(pal)(q, k, v), np.float32)
        err = np.abs(a - b).max()

        t_x = bench(xla, (q, k, v))
        t_p = bench(pal, (q, k, v))
        print(
            f"T={T:5d}: xla {t_x*1e3:7.3f} ms  pallas {t_p*1e3:7.3f} ms  "
            f"speedup {t_x/t_p:5.2f}x  max_err {err:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
