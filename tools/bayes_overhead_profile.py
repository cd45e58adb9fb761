"""Decompose the Bayes-FFN Transformer training-step overhead (VERDICT r3
item 5: 18.0 vs 15.5 ms/step for ONE sampled 4096x512 linear2 in one of six
layers — ~2% of step FLOPs costing 16%).

Times the flagship TM train step under targeted monkeypatches that remove
one suspect at a time:

  base        standard TM (the 15.5 ms yardstick)
  bayes       Bayes-FFN TM as shipped
  no-kl       bayes, KL term zeroed (removes the (4096,512) mean-reductions
              and their grad paths)
  no-sample   bayes, BayesDense scores at the mean (removes sampling AND the
              custom-VJP kernel; keeps the separate-branch structure)
  xla-sample  bayes, fused kernel disabled (XLA sampling path: eps + exp +
              add materialize the perturbed weight per step)

Run under the default axon env: python tools/bayes_overhead_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

from bayeslms_tpu import ModelConfig, TrainConfig
from bayeslms_tpu.models import layers as L
from bayeslms_tpu.models.lstm_lm import init_hidden
from bayeslms_tpu.train.loop import Trainer

V, T, B = 49152, 100, 32


def bench(name, cfg, steps=20):
    trainer = Trainer(cfg, TrainConfig(batch_size=B, seq_len=T, lr=0.1))
    state = trainer.init_state(seed=0)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, cfg.vocab_size, (T, B)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (T, B)).astype(np.int32))
    hidden = init_hidden(cfg.nlayers, B, cfg.nhid)
    lr = jnp.asarray(0.1, jnp.float32)
    ks = jnp.asarray(0.01, jnp.float32)
    impl = trainer.tcfg.rng_impl
    params, opt = state.params, state.opt_state
    out = trainer._train_step(params, opt, hidden, data, tgt, lr, ks,
                              jax.random.key(0, impl=impl))
    params, opt = out[0], out[1]
    float(out[3])
    t0 = time.perf_counter()
    for i in range(steps):
        out = trainer._train_step(params, opt, hidden, data, tgt, lr, ks,
                                  jax.random.key(i + 1, impl=impl))
        params, opt = out[0], out[1]
    float(out[3])
    dt = (time.perf_counter() - t0) / steps * 1000
    print(f"{name:12s} {dt:6.2f} ms/step", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    base_cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=512,
                           nhid=4096, nlayers=6, nhead=8, dropout=0.2,
                           compute_dtype="bfloat16")
    bayes_cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=512,
                            nhid=4096, nlayers=6, nhead=8, dropout=0.2,
                            compute_dtype="bfloat16", uncertainty="Bayesian",
                            t_bayes_pos="FFN")

    bench("base", base_cfg)
    bench("bayes", bayes_cfg)

    orig_kl = L.BayesDense.kl
    L.BayesDense.kl = lambda self, prior_mean=None: jnp.asarray(0.0)
    bench("no-kl", bayes_cfg)
    L.BayesDense.kl = orig_kl

    orig_call = L.BayesDense.__call__

    def mean_only(self, x, deterministic=True):
        return orig_call(self, x, deterministic=True)

    L.BayesDense.__call__ = mean_only
    bench("no-sample", bayes_cfg)
    L.BayesDense.__call__ = orig_call

    orig_ok = L.BayesDense._fused_ok
    L.BayesDense._fused_ok = lambda self, x: False
    bench("xla-sample", bayes_cfg)
    L.BayesDense._fused_ok = orig_ok


if __name__ == "__main__":
    main()
