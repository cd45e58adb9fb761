#!/usr/bin/env python
"""Training throughput on the real TPU chip: tokens/sec for the flagship
recipe configurations (AMI LSTM 1024/1024x2 and Transformer 512/4096x6,
batch 32, seq 100, ~49k vocab, bf16 compute).

Run under the default TPU env: python tools/tpu_train_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same dir as bench.py): flagship train steps
# compile in minutes cold on the tunnel chip, seconds warm. SKIPPED on the
# CPU backend: tests/test_gp_flops.py imports this module for the FLOPs
# model, and enabling the shared cache inside a pytest process makes every
# later test read .jax_cache — a timeout-killed TPU run's truncated entry
# then segfaults the whole suite in deserialize_executable (seen r5).
try:
    if jax.config.jax_platforms != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


V5E_PEAK_BF16 = 197e12  # TPU v5e MXU peak, bf16 FLOP/s


def _gp_cell_delta(g, t, in_size, H):
    """Per-token fwd matmul-FLOP delta of one GPLSTMCell vs a standard LSTM
    layer of the same geometry (models/lstm_lm.py GPLSTMCell). Gates 1-5 ADD
    a GP matmul while the base 4H projections still run; gates 6/7 REPLACE a
    same-shape projection (delta 0); GPNN2 (type 4) adds the random-feature
    and readout matmuls on top of the base gates."""
    if g == 0:
        return 0
    if t <= 3:
        if g in (1, 2, 3, 4):  # GPNN over cat(x, h) -> H
            return 2 * H * (in_size + H)
        if g == 5:             # GPNN cell transform H -> H
            return 2 * H * H
        return 0               # 6/7: replacement, same shape
    out = H if g <= 5 else 4 * H  # type 4: GPNN2 on the gate value
    return 2 * (H * 150 + 150 * out)


def gp_flops_delta(cfg):
    """Per-token fwd matmul-FLOP delta of the GP family vs the base model.

    GPNN types 0-3 are REPLACEMENT units — `y = sum_i coef_i act_i(Wx+b)`
    (model.py:1780-1906) has exactly one matmul, the same shape as the
    linear it replaces; the activation mixture is elementwise (VPU). Only
    the cat(x,h) gate units, the cell transform, and GPNN2's random
    features (model.py:2036-2102) change the MXU count."""
    if cfg.uncertainty != "Gaussian":
        return 0
    H, E = cfg.nhid, cfg.emsize
    if cfg.is_transformer:
        p = cfg.t_gauss_pos
        if 1 <= p <= 3:
            return 0  # GPNN replaces linear1 (E -> F), same shape
        if p == 4:    # GPNN2 replaces linear1: freq + readout vs E*F
            return 2 * (E * 150 + 150 * H) - 2 * E * H
        return 0
    s = cfg.l_gauss_pos
    if int(s[0]) == 0:
        return 0
    if len(s) == 2:    # GP cell layer 1 (in = E) + standard layer 2
        return _gp_cell_delta(int(s[0]), int(s[1]), E, H)
    if len(s) == 3:    # standard layer 1 + GP cell layer 2 (in = H)
        return _gp_cell_delta(int(s[0]), int(s[1]), H, H)
    return (_gp_cell_delta(int(s[0]), int(s[1]), E, H)
            + _gp_cell_delta(int(s[2]), int(s[1]), H, H))


def train_flops_per_step(cfg, T, B):
    """Matmul FLOPs of one optimizer step (fwd + bwd = 3x fwd, each matmul
    2*MACs): recurrent/projection/FFN weights + the tied decoder + (TM)
    attention score/value einsums + the GP family's unit deltas
    (gp_flops_delta — exact, not a lower bound). Embedding gathers and
    elementwise ops (incl. the GP activation mixture and Bayes/Variational
    noise adds) are excluded — they are HBM/VPU-bound, not MXU work."""
    tokens = T * B
    gp = gp_flops_delta(cfg) * tokens * 3  # fwd + bwd
    if cfg.is_transformer:
        E, F, L, h = cfg.emsize, cfg.nhid, cfg.nlayers, cfg.nhead
        proj = L * (4 * E * E + 2 * E * F)      # qkv+o and the two FFN mats
        dec = E * cfg.vocab_size
        attn = L * 2 * (T * T * E) * B * 2      # QK^T and PV, fwd, FLOPs
        return 6 * (proj + dec) * tokens + 3 * attn + gp
    H, E, L = cfg.nhid, cfg.emsize, cfg.nlayers
    rec = 4 * H * E + (L - 1) * 4 * H * H + L * 4 * H * H  # W_ih + W_hh
    dec = H * cfg.vocab_size
    return 6 * (rec + dec) * tokens + gp


def bench_model(name, cfg, steps=20):
    from bayeslms_tpu import TrainConfig
    from bayeslms_tpu.models.lstm_lm import init_hidden
    from bayeslms_tpu.train.loop import Trainer

    # recipe geometry by default; BAYESLM_BENCH_B overrides to measure the
    # batch-scaling headroom beyond the reference recipe (ROOFLINE.md)
    T, B = 100, int(os.environ.get("BAYESLM_BENCH_B", 32))
    trainer = Trainer(cfg, TrainConfig(batch_size=B, seq_len=T, lr=0.1))
    state = trainer.init_state(seed=0)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, cfg.vocab_size, (T, B)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (T, B)).astype(np.int32))
    hidden = init_hidden(cfg.nlayers, B, cfg.nhid)
    lr = jnp.asarray(0.1, jnp.float32)
    ks = jnp.asarray(0.01, jnp.float32)

    impl = trainer.tcfg.rng_impl  # match fit()'s key implementation
    params, opt = state.params, state.opt_state
    # warmup/compile
    out = trainer._train_step(params, opt, hidden, data, tgt, lr, ks,
                              jax.random.key(0, impl=impl))
    params, opt = out[0], out[1]
    float(out[3])

    t0 = time.perf_counter()
    for i in range(steps):
        out = trainer._train_step(
            params, opt, hidden, data, tgt, lr, ks,
            jax.random.key(i + 1, impl=impl)
        )
        params, opt = out[0], out[1]
    float(out[3])  # single sync at the end
    dt = (time.perf_counter() - t0) / steps
    toks = T * B / dt
    peak = float(os.environ.get("BAYESLM_PEAK_FLOPS", V5E_PEAK_BF16))
    fl = train_flops_per_step(cfg, T, B)
    mfu = fl / dt / peak
    print(f"{name}: {dt*1000:.1f} ms/step, {toks/1e3:.1f}k tokens/sec, "
          f"{fl/1e9:.0f} GFLOP/step, MFU {mfu*100:.1f}%", flush=True)
    return toks


if __name__ == "__main__":
    from bayeslms_tpu import ModelConfig

    # select a single config via argv to bound each invocation's compile
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("platform:", jax.devices()[0].platform, flush=True)
    V = 49152
    if which in ("all", "lstm"): bench_model(
        "LSTM-1024x2 (none)",
        ModelConfig(model="LSTM", vocab_size=V, emsize=1024, nhid=1024,
                    dropout=0.2, compute_dtype="bfloat16"),
    )
    if which in ("all", "bayes-lstm"): bench_model(
        "LSTM-1024x2 (Bayesian pos=3)",
        ModelConfig(model="LSTM", vocab_size=V, emsize=1024, nhid=1024,
                    dropout=0.2, compute_dtype="bfloat16",
                    uncertainty="Bayesian", l_bayes_pos=3),
    )
    # GP / Variational families: the reference runs these as per-timestep
    # python loops (model.py:1720-1742, :2503-2513 — its #1 bottleneck,
    # SURVEY §3.1); here they are lax.scan cells like the standard LSTM.
    # FLOPs model includes the GP units' exact matmul deltas
    # (gp_flops_delta): for the benched configs (gate-6 GPLSTM, type-3
    # GPNN FFN) the GP unit REPLACES a same-shape matmul, so the delta is
    # zero and the reported MFU is exact, not a lower bound.
    if which in ("all", "gp-lstm"): bench_model(
        "GP-LSTM-1024x2 (L_gauss_pos=63)",
        ModelConfig(model="LSTM", vocab_size=V, emsize=1024, nhid=1024,
                    dropout=0.2, compute_dtype="bfloat16",
                    uncertainty="Gaussian", l_gauss_pos="63"),
    )
    if which in ("all", "v-lstm"): bench_model(
        "V-LSTM-1024x2 (L_v_pos=11)",
        ModelConfig(model="LSTM", vocab_size=V, emsize=1024, nhid=1024,
                    dropout=0.2, compute_dtype="bfloat16",
                    uncertainty="Variational", l_v_pos="11"),
    )
    if which in ("all", "tm"): bench_model(
        "Transformer-512/4096x6 (none)",
        ModelConfig(model="Transformer", vocab_size=V, emsize=512, nhid=4096,
                    nlayers=6, nhead=8, dropout=0.2, compute_dtype="bfloat16"),
    )
    if which in ("all", "bayes-tm"): bench_model(
        "Transformer-512/4096x6 (Bayesian FFN)",
        ModelConfig(model="Transformer", vocab_size=V, emsize=512, nhid=4096,
                    nlayers=6, nhead=8, dropout=0.2, compute_dtype="bfloat16",
                    uncertainty="Bayesian", t_bayes_pos="FFN"),
    )
    if which in ("all", "gauss-tm"): bench_model(
        "Transformer-512/4096x6 (GPNN type-3 FFN)",
        ModelConfig(model="Transformer", vocab_size=V, emsize=512, nhid=4096,
                    nlayers=6, nhead=8, dropout=0.2, compute_dtype="bfloat16",
                    uncertainty="Gaussian", t_gauss_pos=3),
    )
    if which in ("all", "v-tm"): bench_model(
        "Transformer-512/4096x6 (V layer0)",
        ModelConfig(model="Transformer", vocab_size=V, emsize=512, nhid=4096,
                    nlayers=6, nhead=8, dropout=0.2, compute_dtype="bfloat16",
                    uncertainty="Variational", t_v_pos=1),
    )
