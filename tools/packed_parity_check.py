"""On-chip A/B: packed-time carry-over vs the slotted carry layout.

Runs the bench workload's scorer twice on the real TPU chip — once with
BAYESLM_PACKED_CARRY=1 (packed-time layout) and once with the slotted
layout — and asserts the per-hypothesis scores agree. Complements
tests/test_rescore.py::test_packed_carry_matches_slotted, which validates
the same equivalence in Pallas interpret mode on CPU.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_synthetic_nbest, stream_of  # noqa: E402


def run(packed: bool, extra=None):
    os.environ["BAYESLM_PACKED_CARRY"] = "1" if packed else "0"
    from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
    from bayeslms_tpu.rescore.scorer import BatchScorer

    V = 49152
    cfg = ModelConfig(
        model="LSTM", vocab_size=V, emsize=1024, nhid=1024, nlayers=2,
        dropout=0.2, compute_dtype="bfloat16", **(extra or {}),
    )
    model = build_model(cfg)
    params = init_params(model, cfg, seq_len=8, batch=2)
    w2i = {"<s>": 0, "<unk>": 1}
    for i in range(V - 2):
        w2i[f"w{i}"] = 2 + i
    nbest = make_synthetic_nbest(n_meetings=3, utts_per_meeting=5)
    scorer = BatchScorer(cfg, params, RescoreConfig(carry_over=True, max_hyp_len=64))
    print(f"packed_allowed={scorer._packed_allowed()} (want {packed})")
    return nbest, scorer.score_nbest(nbest, w2i, stream_fn=stream_of)


def main():
    # --gp adds the GP-LSTM flagship config (scan-path GP cell + Pallas std
    # layer under packing); default is the standard flagship LSTM
    extra = {"uncertainty": "Gaussian", "l_gauss_pos": "13"} if "--gp" in sys.argv else None
    nbest, a = run(packed=True, extra=extra)
    _, b = run(packed=False, extra=extra)
    worst = 0.0
    for k in nbest:
        sa = np.array([s for _, s in a[k]])
        sb = np.array([s for _, s in b[k]])
        worst = max(worst, float(np.max(np.abs(sa - sb) / np.maximum(np.abs(sb), 1.0))))
    print(f"max relative score delta: {worst:.6f}")
    # bf16 recurrence: packed resets reorder a handful of bf16 ops; allow 1%
    assert worst < 0.01, worst
    print("PACKED PARITY OK")


if __name__ == "__main__":
    main()
