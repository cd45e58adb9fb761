#!/usr/bin/env python
"""NAS search-step throughput on the real TPU chip at the flagship geometry.

Measures one DARTS iteration — architect.step (first-order or exactly
unrolled second-order) + the supernet weight step — for the Bayesian
Transformer supernet at the AMI recipe size (512/4096x6, 8 heads, ~49k
vocab, batch 32, seq 100), i.e. the geometry the reference's
train_search_bayes.py runs (ROUND1_NOTES item 7 / VERDICT round-1 item 5:
"profile the unrolled mode at the flagship geometry").

Usage: python tools/tpu_nas_bench.py [first|unrolled|both] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(unrolled: bool, steps: int = 10):
    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.models.lstm_lm import init_hidden
    from bayeslms_tpu.nas.search import SearchRunner
    from bayeslms_tpu.train.optim import init_opt_state

    T, B, V = 100, 32, 49152
    cfg = ModelConfig(
        model="Transformer", vocab_size=V, emsize=512, nhid=4096, nlayers=6,
        nhead=8, dropout=0.2, compute_dtype="bfloat16",
        uncertainty="Bayesian", t_bayes_pos="FFN",
    )
    runner = SearchRunner(cfg, TrainConfig(batch_size=B, seq_len=T, lr=0.1),
                          mode="bayes", unrolled=unrolled)
    params, arch = runner.init_params(seed=0)
    a_state = runner.architect.init(arch)
    opt_state = init_opt_state(params)
    hidden = init_hidden(cfg.nlayers, B, cfg.nhid)

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, V, (T, B)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, V, (T, B)).astype(np.int32))
    kl_scale = jnp.asarray(1e-4, jnp.float32)
    batch = (data, tgt, hidden, kl_scale)
    lr = jnp.asarray(0.1, jnp.float32)

    def one(i):
        k = jax.random.fold_in(jax.random.key(1), i)
        kd, ks, kg = jax.random.split(k, 3)
        rngs = {"dropout": kd, "sample": ks, "gumbel": kg}
        a = runner.architect.step(a_state, params, batch, batch, rngs)
        p, o, loss = runner._w_step(params, opt_state, a.arch, batch, lr, rngs)
        return a, p, o, loss

    label = "unrolled-2nd-order" if unrolled else "first-order"
    t0 = time.perf_counter()
    a_state, params, opt_state, loss = one(0)
    float(loss)
    print(f"{label}: compile+step {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        a_state, params, opt_state, loss = one(i)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    print(f"{label}: {dt*1000:.1f} ms/search-step "
          f"({T*B/dt/1e3:.1f}k tokens/sec incl. architect)", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print("platform:", jax.devices()[0].platform, flush=True)
    if which in ("both", "first"):
        bench(False, steps)
    if which in ("both", "unrolled"):
        bench(True, steps)
