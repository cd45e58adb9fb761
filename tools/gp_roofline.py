#!/usr/bin/env python
"""GP-LSTM train-step decomposition (round-5 VERDICT item 8).

The round-4 roofline left the GP-LSTM at 23.1 ms/step vs the base LSTM's
17.7 with no breakdown. The GP cell (models/lstm_lm.py GPLSTMCell) runs as
a plain ``lax.scan`` while the standard layers take the fused Pallas
custom-VJP recurrence — so the +5.4 ms has three candidate components:

  (a) the scan recurrence itself: W_hh (8 MB bf16) re-read from HBM every
      timestep in forward AND backward, plus per-step residual
      store/reload for autodiff (the two costs the Pallas train kernel
      eliminates — ROOFLINE.md LSTM decomposition);
  (b) the GP activation mixture: k=3 transcendentals + weighted sum over
      the (B, 4H) gate tensor per step (VPU);
  (c) everything else (sampling plumbing, KL, coef grads).

Variants measured (all 1024/1024x2, B=32, T=100, V=49152, bf16):

  lstm-pallas   base LSTM, fused train kernels          (baseline)
  lstm-scan     base LSTM under no_pallas()             -> 2x (a)
  gp63          GP-LSTM L_gauss_pos=63 as shipped       (the 23.1 row)
  gp63-act1     same but GPNN act_set trimmed to (relu,) -> isolates (b)

Identity checked: gp63 ~= lstm-pallas + (lstm-scan - lstm-pallas)/2
                          + mixture + GP residual overhead.

Run on the real chip: python tools/gp_roofline.py [variant]
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


def bench(name, cfg, steps=30, no_pallas_ctx=False):
    from bayeslms_tpu import TrainConfig
    from bayeslms_tpu.models.lstm_lm import init_hidden
    from bayeslms_tpu.ops.kernel_gate import no_pallas
    from bayeslms_tpu.train.loop import Trainer

    import contextlib

    T, B = 100, 32
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

    ctx = no_pallas() if no_pallas_ctx else contextlib.nullcontext()
    with ctx:  # gate is consulted at TRACE time
        out = trainer._train_step(params, opt, hidden, data, tgt, lr, ks,
                                  jax.random.key(0, impl=impl))
        params, opt = out[0], out[1]
        float(out[3])
        t0 = time.perf_counter()
        for i in range(steps):
            out = trainer._train_step(
                params, opt, hidden, data, tgt, lr, ks,
                jax.random.key(i + 1, impl=impl))
            params, opt = out[0], out[1]
        float(out[3])
    dt = (time.perf_counter() - t0) / steps
    print(f"{name}: {dt*1000:.2f} ms/step ({T*B/dt/1e3:.1f}k tok/s)",
          flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("platform:", jax.devices()[0].platform, flush=True)
    from bayeslms_tpu import ModelConfig

    V = 49152
    base = dict(model="LSTM", vocab_size=V, emsize=1024, nhid=1024,
                dropout=0.2, compute_dtype="bfloat16")
    r = {}
    if which in ("all", "lstm-pallas"):
        r["lstm-pallas"] = bench("lstm-pallas", ModelConfig(**base))
    if which in ("all", "lstm-scan"):
        r["lstm-scan"] = bench("lstm-scan", ModelConfig(**base),
                               no_pallas_ctx=True)
    if which in ("all", "gp63"):
        r["gp63"] = bench("gp63", ModelConfig(
            uncertainty="Gaussian", l_gauss_pos="63", **base))
    if which in ("all", "gp13"):
        # the twin config family (gate 1, type 3) — gate-replacement kernel
        r["gp13"] = bench("gp13", ModelConfig(
            uncertainty="Gaussian", l_gauss_pos="13", **base))
    if which == "gp13-scan":
        os.environ["BAYESLM_PALLAS_GPLSTM"] = "0"
        r["gp13-scan"] = bench("gp13-scan", ModelConfig(
            uncertainty="Gaussian", l_gauss_pos="13", **base))
        del os.environ["BAYESLM_PALLAS_GPLSTM"]
    if which == "gp63-scan":
        os.environ["BAYESLM_PALLAS_GPLSTM"] = "0"
        r["gp63-scan"] = bench("gp63-scan", ModelConfig(
            uncertainty="Gaussian", l_gauss_pos="63", **base))
        del os.environ["BAYESLM_PALLAS_GPLSTM"]
    if which in ("all", "gp63-act1"):
        # trim the GPNN mixture to one cheap activation: swap the class the
        # GP cell constructs for a subclass whose act_set default is (relu,)
        from bayeslms_tpu.models import layers as L
        from bayeslms_tpu.models import lstm_lm as M

        class GPNNAct1(L.GPNN):
            act_set = ("relu",)

        orig = M.GPNN
        M.GPNN = GPNNAct1
        try:
            r["gp63-act1"] = bench("gp63-act1", ModelConfig(
                uncertainty="Gaussian", l_gauss_pos="63", **base))
        finally:
            M.GPNN = orig

    if len(r) >= 4:
        scan_delta = (r["lstm-scan"] - r["lstm-pallas"]) / 2
        mix = r["gp63"] - r["gp63-act1"]
        resid = r["gp63"] - r["lstm-pallas"] - scan_delta - mix
        print(f"\nper-layer scan-vs-pallas delta: {scan_delta*1e3:.2f} ms")
        print(f"3-act mixture vs 1 relu:        {mix*1e3:.2f} ms")
        print(f"unattributed residual:          {resid*1e3:.2f} ms")


if __name__ == "__main__":
    main()
