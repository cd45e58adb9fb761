"""Transformer-LM rescoring throughput on the real chip (flagship
512/4096x6/8h geometry, ~49k vocab): same AMI-shaped workload as bench.py,
bucketed full-context scoring (the reference TM scorer has no hidden
carry-over; each hypothesis is scored independently).

Usage: python tools/tm_bench.py [uncertainty]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_synthetic_nbest  # noqa: E402


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

    unc = sys.argv[1] if len(sys.argv) > 1 else "none"
    V = 49152
    cfg = ModelConfig(
        model="Transformer", vocab_size=V, emsize=512, nhid=4096, nlayers=6,
        nhead=8, dropout=0.2, compute_dtype="bfloat16", uncertainty=unc,
        **({"t_bayes_pos": "FFN"} if unc == "Bayesian" else {}),
    )
    model = build_model(cfg)
    params = init_params(model, cfg, seq_len=8, batch=2)
    w2i = {"<s>": 0, "<unk>": 1}
    for i in range(V - 2):
        w2i[f"w{i}"] = 2 + i
    nbest = make_synthetic_nbest()
    n_total = sum(len(h) for h in nbest.values())
    bs = int(os.environ.get("TM_BENCH_BS", "256"))
    scorer = BatchScorer(cfg, params,
                         RescoreConfig(carry_over=False, max_hyp_len=64,
                                       batch_size=bs))
    scorer.score_nbest(nbest, w2i)  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        scorer.score_nbest(nbest, w2i)
        best = min(best, time.perf_counter() - t0)
    print(f"Transformer ({unc}) rescoring: {n_total / best:.0f} hyps/sec/chip")


if __name__ == "__main__":
    main()
