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


def bench(fn, args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    # dependency-chained timing: block_until_ready returns early through the
    # axon relay, so thread the output back in and fetch one scalar at the end
    t0 = time.perf_counter()
    x = args[0]
    for _ in range(iters):
        out = fn(x, *args[1:])
        x = x + 0 * out  # serialize
    float(jnp.sum(x[0, 0]))
    return (time.perf_counter() - t0) / iters


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

        xla = jax.jit(
            lambda q, k, v: multihead_attention(q, k, v, H, mask, causal=False)
        )
        pal = jax.jit(lambda q, k, v: causal_attention_pallas(q, k, v, H))

        # correctness first
        a = np.asarray(xla(q, k, v), np.float32)
        b = np.asarray(pal(q, k, v), np.float32)
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
