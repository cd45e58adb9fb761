"""Interpolated-rescoring throughput on the real chip.

The reference's headline rescoring config interpolates the Bayesian LM with
a pretrained baseline NN LM (inter_flag=1, alpha=0.8 — run_nnlm_ami_tm.sh:33,
compute_sentence_scores_bayes_jianwei.py:157-163). This benchmark measures
that two-model config end-to-end on the AMI-shaped workload:

- fused/packed path (default): logit interpolation as ONE fused CE kernel
  call over concatenated hiddens against the pre-scaled concat decoder
  [h1, h2] @ concat(a*W1, (1-a)*W2)'.
- legacy path (BAYESLM_FUSED_CE=0): unfused slotted scoring with full
  (T, B, V) logits from both models — what every interpolated run paid
  before the fused-interp path existed.

Usage: python tools/interp_bench.py [lstm|tm] [inter_flag]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_synthetic_nbest, stream_of  # noqa: E402


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
    from bayeslms_tpu.rescore.scorer import BatchScorer

    family = sys.argv[1] if len(sys.argv) > 1 else "lstm"
    inter_flag = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    V = 49152
    if family == "tm":
        cfg = ModelConfig(
            model="Transformer", vocab_size=V, emsize=512, nhid=4096,
            nlayers=6, nhead=8, dropout=0.2, compute_dtype="bfloat16",
            uncertainty="Bayesian", t_bayes_pos="FFN",
        )
        cfg2 = ModelConfig(
            model="Transformer", vocab_size=V, emsize=512, nhid=4096,
            nlayers=6, nhead=8, dropout=0.2, compute_dtype="bfloat16",
        )
        rc = RescoreConfig(carry_over=False, max_hyp_len=64,
                           inter_flag=inter_flag, inter_alpha=0.8)
    else:
        cfg = ModelConfig(
            model="LSTM", vocab_size=V, emsize=1024, nhid=1024, nlayers=2,
            dropout=0.2, compute_dtype="bfloat16",
            uncertainty="Bayesian", l_bayes_pos=3,
        )
        cfg2 = ModelConfig(
            model="LSTM", vocab_size=V, emsize=1024, nhid=1024, nlayers=2,
            dropout=0.2, compute_dtype="bfloat16",
        )
        rc = RescoreConfig(carry_over=True, max_hyp_len=64,
                           inter_flag=inter_flag, inter_alpha=0.8)
    params = init_params(build_model(cfg), cfg, seq_len=8, batch=2)
    params2 = init_params(build_model(cfg2), cfg2, seq_len=8, batch=2, seed=9)
    w2i = {"<s>": 0, "<unk>": 1}
    for i in range(V - 2):
        w2i[f"w{i}"] = 2 + i
    nbest = make_synthetic_nbest()
    n_total = sum(len(h) for h in nbest.values())
    scorer = BatchScorer(cfg, params, rc, cfg2=cfg2, params2=params2)
    path = "fused" if scorer.use_fused_ce else "unfused-slotted"
    sfn = stream_of if rc.carry_over else None
    scorer.score_nbest(nbest, w2i, stream_fn=sfn)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        scorer.score_nbest(nbest, w2i, stream_fn=sfn)
        best = min(best, time.perf_counter() - t0)
    print(f"interp (family={family} inter_flag={inter_flag} path={path}): "
          f"{n_total / best:.0f} hyps/sec/chip")


if __name__ == "__main__":
    main()
