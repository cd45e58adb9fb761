"""GP-LSTM rescoring throughput on the real chip (the flagship best-PPL
config, docs/CONVERGENCE.md): same AMI-shaped workload as bench.py, GP cell
in layer 1 (l_gauss_pos "13") + standard layer 2.

Usage: python tools/gp_bench.py [l_gauss_pos]
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

    pos = sys.argv[1] if len(sys.argv) > 1 else "13"
    V = 49152
    cfg = ModelConfig(
        model="LSTM", vocab_size=V, emsize=1024, nhid=1024, nlayers=2,
        dropout=0.2, compute_dtype="bfloat16",
        uncertainty="Gaussian", l_gauss_pos=pos,
    )
    model = build_model(cfg)
    params = init_params(model, cfg, seq_len=8, batch=2)
    w2i = {"<s>": 0, "<unk>": 1}
    for i in range(V - 2):
        w2i[f"w{i}"] = 2 + i
    nbest = make_synthetic_nbest()
    n_total = sum(len(h) for h in nbest.values())
    scorer = BatchScorer(cfg, params, RescoreConfig(carry_over=True, max_hyp_len=64))
    scorer.score_nbest(nbest, w2i, stream_fn=stream_of)  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        scorer.score_nbest(nbest, w2i, stream_fn=stream_of)
        best = min(best, time.perf_counter() - t0)
    print(f"GP-LSTM (l_gauss_pos={pos}) rescoring: {n_total / best:.0f} hyps/sec/chip")


if __name__ == "__main__":
    main()
