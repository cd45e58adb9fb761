#!/usr/bin/env python
"""Training-path attention: flash VJP kernel vs the XLA einsum path, fwd+bwd
with attention-prob dropout 0.2, on the real TPU chip.

Geometry: E=512, 8 heads (the AMI Transformer recipe), batch 32,
T in {100, 512, 2048}, bf16 inputs, rbg dropout keys (the Trainer default).

Run: python tools/tpu_attn_train_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, n1=5, n2=105):
    """Chained in-jit loops of two lengths; per-iter = slope (cancels the
    ~40 ms relay overhead; scalar fetch forces completion)."""

    def timed(iters):
        @jax.jit
        def loop(q, k, v):
            def body(_, carry):
                g = fn(carry, k, v)
                return carry + jnp.asarray(1e-6, carry.dtype) * g

            return jax.lax.fori_loop(0, iters, body, q)

        float(jnp.sum(loop(*args)[0, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(loop(*args)[0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    from bayeslms_tpu.ops.attention import causal_mask, multihead_attention
    from bayeslms_tpu.ops.attention_train_pallas import flash_attention_train

    E, H, B, RATE = 512, 8, 32, 0.2
    key = jax.random.key(7, impl="rbg")
    seed = jnp.asarray([7], jnp.int32)
    print("platform:", jax.devices()[0].platform, flush=True)
    for T in (100, 512, 2048):
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(3)
        )
        mask = causal_mask(T)

        def xla_loss(q, k, v):
            out = multihead_attention(q, k, v, H, mask, dropout_rate=RATE,
                                      dropout_rng=key, deterministic=False,
                                      causal=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def pal_loss(q, k, v):
            out = flash_attention_train(q, k, v, H, RATE, seed)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        xla = jax.grad(xla_loss)
        pal = jax.grad(pal_loss)
        t_x = bench(xla, (q, k, v))
        t_p = bench(pal, (q, k, v))
        print(
            f"T={T:5d}: xla fwd+bwd {t_x*1e3:7.3f} ms  pallas {t_p*1e3:7.3f} ms"
            f"  speedup {t_x/t_p:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
