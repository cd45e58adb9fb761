"""Host-side profile of one packed rescoring pass (where do the ~70 ms of
non-device time go?). cProfile over score_nbest after warmup.
"""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_synthetic_nbest, stream_of  # noqa: E402


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
    from bayeslms_tpu.rescore.scorer import BatchScorer

    V = 49152
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=1024, nhid=1024,
                      nlayers=2, dropout=0.2, compute_dtype="bfloat16")
    model = build_model(cfg)
    params = init_params(model, cfg, seq_len=8, batch=2)
    w2i = {"<s>": 0, "<unk>": 1}
    for i in range(V - 2):
        w2i[f"w{i}"] = 2 + i
    nbest = make_synthetic_nbest()
    scorer = BatchScorer(cfg, params, RescoreConfig(carry_over=True, max_hyp_len=64))
    scorer.score_nbest(nbest, w2i, stream_fn=stream_of)  # warm
    t0 = time.perf_counter()
    scorer.score_nbest(nbest, w2i, stream_fn=stream_of)
    print(f"pass: {time.perf_counter() - t0:.3f}s")

    pr = cProfile.Profile()
    pr.enable()
    scorer.score_nbest(nbest, w2i, stream_fn=stream_of)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
