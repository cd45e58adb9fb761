#!/usr/bin/env python
"""Model-zoo smoke on the REAL TPU chip: one jitted train step per family.

The test suite exercises the full 4x2 uncertainty grid on the virtual CPU
mesh; this tool proves every family also compiles and takes a finite
training step on actual TPU hardware (fused kernels engaged where their
gates allow). Prints per-config compile+step timing and a final verdict.

Run: python tools/tpu_zoo_check.py [quick]
  quick = first 4 configs only (bounds wall-clock for spot checks).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def step_once(cfg, T=32, B=8):
    from bayeslms_tpu import TrainConfig
    from bayeslms_tpu.models.lstm_lm import init_hidden
    from bayeslms_tpu.train.loop import Trainer

    trainer = Trainer(cfg, TrainConfig(batch_size=B, seq_len=T, lr=0.1))
    state = trainer.init_state(seed=0)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, cfg.vocab_size, (T, B)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (T, B)).astype(np.int32))
    hidden = init_hidden(cfg.nlayers, B, cfg.nhid)
    impl = trainer.tcfg.rng_impl
    t0 = time.perf_counter()
    out = trainer._train_step(
        state.params, state.opt_state, hidden, data, tgt,
        jnp.asarray(0.1, jnp.float32), jnp.asarray(0.01, jnp.float32),
        jax.random.key(0, impl=impl),
    )
    loss = float(out[3])
    dt = time.perf_counter() - t0
    return loss, dt


def main():
    from bayeslms_tpu import ModelConfig

    V, E, H, FF = 8192, 256, 256, 512
    lstm = dict(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.2,
                compute_dtype="bfloat16")
    tm = dict(model="Transformer", vocab_size=V, emsize=E, nhid=FF, nlayers=2,
              nhead=4, dropout=0.2, compute_dtype="bfloat16")
    configs = [
        ("LSTM none", ModelConfig(**lstm)),
        ("LSTM Bayes pos3", ModelConfig(**lstm, uncertainty="Bayesian",
                                        l_bayes_pos=3)),
        ("TM none", ModelConfig(**tm)),
        ("TM Bayes FFN", ModelConfig(**tm, uncertainty="Bayesian",
                                     t_bayes_pos="FFN")),
        ("LSTM Bayes pos5 (whole layer)", ModelConfig(
            **lstm, uncertainty="Bayesian", l_bayes_pos=5)),
        ("GP-LSTM 63 (gate6, gpnn3)", ModelConfig(
            **lstm, uncertainty="Gaussian", l_gauss_pos="63")),
        ("GP-LSTM 6360 (both layers)", ModelConfig(
            **lstm, uncertainty="Gaussian", l_gauss_pos="6360")),
        ("Variational LSTM 11", ModelConfig(
            **lstm, uncertainty="Variational", l_v_pos="11")),
        ("GaussLSTM legacy pos2", ModelConfig(
            **lstm, uncertainty="Gaussian", l_gauss_legacy_pos=2)),
        ("VLSTM legacy", ModelConfig(
            **lstm, uncertainty="Variational", l_v_legacy=True)),
        ("TM Bayes MHA", ModelConfig(**tm, uncertainty="Bayesian",
                                     t_bayes_pos="MHA")),
        ("TM Bayes EMB", ModelConfig(**tm, uncertainty="Bayesian",
                                     t_bayes_pos="EMB")),
        ("TM Gauss pos3", ModelConfig(**tm, uncertainty="Gaussian",
                                      t_gauss_pos=3)),
        ("TM Gauss pos4 (GPNN2)", ModelConfig(**tm, uncertainty="Gaussian",
                                              t_gauss_pos=4)),
        ("TM Variational pos1", ModelConfig(**tm, uncertainty="Variational",
                                            t_v_pos=1)),
        ("GRU none", ModelConfig(**{**lstm, "model": "GRU"})),
    ]
    if len(sys.argv) > 1 and sys.argv[1] == "quick":
        configs = configs[:4]

    print("platform:", jax.devices()[0].platform, flush=True)
    failed = []
    for name, cfg in configs:
        try:
            loss, dt = step_once(cfg)
            ok = np.isfinite(loss)
            print(f"{name:34s} loss {loss:9.4f}  compile+step {dt:6.1f}s"
                  f"  {'OK' if ok else 'NON-FINITE'}", flush=True)
            if not ok:
                failed.append(name)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}", flush=True)
            failed.append(name)
    if failed:
        print("ZOO CHECK FAILED:", failed)
        sys.exit(1)
    print(f"ALL {len(configs)} ZOO CONFIGS TRAIN ON TPU")


if __name__ == "__main__":
    main()
