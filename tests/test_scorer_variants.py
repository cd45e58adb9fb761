"""Dev-scorer variants: MC-average inference, backward-LM scoring, context
splice (reference compute_sentence_scores_bayes_jianwei copy.py features)."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
from bayeslms_tpu.rescore.nbest import encode_hyp
from bayeslms_tpu.rescore.scorer import BatchScorer

V = 30
W2I = {w: i for i, w in enumerate(["<s>", "<unk>"] + [f"w{i}" for i in range(V - 2)])}
NBEST = OrderedDict([("u1", ["w1 w2 w3", "w1 w2"]), ("u2", ["w5"])])


def test_encode_backward_and_splice():
    x, y, nc, _ = encode_hyp("w1 w2 w3", W2I, backward=True)
    assert x == [0, W2I["w3"], W2I["w2"], W2I["w1"]]
    assert y == [W2I["w3"], W2I["w2"], W2I["w1"], 0]
    assert nc == 0

    x, y, nc, _ = encode_hyp("w1", W2I, context="w7 w8 w9", splice_len=2)
    assert nc == 2
    assert x == [0, W2I["w8"], W2I["w9"], W2I["w1"]]
    assert y == [W2I["w8"], W2I["w9"], W2I["w1"], 0]


def _tm_cfg(**kw):
    return ModelConfig(model="Transformer", vocab_size=V, emsize=8, nhid=16,
                       nlayers=2, nhead=2, dropout=0.0, **kw)


def test_mc_average_transformer():
    """For a deterministic model, MC-average must equal mean scoring; for a
    variational model it must differ (noise is live) yet stay finite."""
    cfg = _tm_cfg()
    model = build_model(cfg)
    params = init_params(model, cfg)
    mean_scores = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16)).score_nbest(
        NBEST, W2I
    )
    mc_scores = BatchScorer(
        cfg, params, RescoreConfig(max_hyp_len=16, mc_samples=3)
    ).score_nbest(NBEST, W2I)
    for k in NBEST:
        for (h1, s1), (h2, s2) in zip(mean_scores[k], mc_scores[k]):
            np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)

    vcfg = _tm_cfg(uncertainty="Variational", t_v_pos=1, v_seq_len=16)
    vmodel = build_model(vcfg)
    vparams = init_params(vmodel, vcfg)
    v_mean = BatchScorer(vcfg, vparams, RescoreConfig(max_hyp_len=16)).score_nbest(
        NBEST, W2I
    )
    v_mc = BatchScorer(
        vcfg, vparams, RescoreConfig(max_hyp_len=16, mc_samples=4)
    ).score_nbest(NBEST, W2I)
    diffs = [
        abs(s1 - s2)
        for k in NBEST
        for (_, s1), (_, s2) in zip(v_mean[k], v_mc[k])
    ]
    assert all(np.isfinite(d) for d in diffs)
    assert max(diffs) > 1e-6  # sampling actually happened


def test_backward_scoring_reverses():
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    fwd = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16, carry_over=False)
                      ).score_nbest(NBEST, W2I)
    bwd = BatchScorer(cfg, params,
                      RescoreConfig(max_hyp_len=16, carry_over=False, backward=True)
                      ).score_nbest(NBEST, W2I)
    # backward score of "w1 w2 w3" == forward score of "w3 w2 w1"
    rev = OrderedDict([("u1", ["w3 w2 w1", "w2 w1"]), ("u2", ["w5"])])
    rev_fwd = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16, carry_over=False)
                          ).score_nbest(rev, W2I)
    np.testing.assert_allclose(bwd["u1"][0][1], rev_fwd["u1"][0][1], rtol=1e-5)
    assert abs(bwd["u1"][0][1] - fwd["u1"][0][1]) > 1e-6


def test_context_splice_masks_context():
    """Spliced context conditions the model but is excluded from the score:
    a context-spliced single-word hyp scores differently from no-context
    (conditioning changed) while remaining a 2-token score."""
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    nb = OrderedDict([("u1", ["w1"])])
    plain = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16, carry_over=False)
                        ).score_nbest(nb, W2I)
    spliced = BatchScorer(
        cfg, params, RescoreConfig(max_hyp_len=16, carry_over=False, splice_len=3)
    ).score_nbest(nb, W2I, context_map={"u1": "w7 w8 w9"})
    assert abs(plain["u1"][0][1] - spliced["u1"][0][1]) > 1e-6
    # score magnitude ~ 2 tokens of CE, not 5 (context masked out)
    assert spliced["u1"][0][1] < 3.0 * np.log(V)
    # conditioning is REAL: a different context changes the score (the LSTM
    # must process context tokens through the recurrence, step-mask intact)
    spliced2 = BatchScorer(
        cfg, params, RescoreConfig(max_hyp_len=16, carry_over=False, splice_len=3)
    ).score_nbest(nb, W2I, context_map={"u1": "w2 w3 w4"})
    assert abs(spliced2["u1"][0][1] - spliced["u1"][0][1]) > 1e-6


def test_auto_splice_chains_previous_first_hyp():
    """With splice_len set and no explicit context_map, each utterance is
    conditioned on the accumulated first-hypothesis text of its chain."""
    cfg = _tm_cfg()
    model = build_model(cfg)
    params = init_params(model, cfg)
    nb = OrderedDict([("u1", ["w1 w2"]), ("u2", ["w5"]), ("u3", ["w7"])])

    auto = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16, splice_len=4)
                       ).score_nbest(nb, W2I)
    manual = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16, splice_len=4)
                         ).score_nbest(nb, W2I, context_map={
                             "u1": "", "u2": "w1 w2", "u3": "w1 w2 w5"})
    for k in nb:
        np.testing.assert_allclose(auto[k][0][1], manual[k][0][1], rtol=1e-5)
    # and the context must matter (u2 differs from no-splice scoring)
    plain = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16)).score_nbest(nb, W2I)
    assert abs(plain["u2"][0][1] - auto["u2"][0][1]) > 1e-6


def test_fused_ce_scoring_matches_xla_paths(monkeypatch):
    """Force the fused decode+CE scoring paths (interpret mode) and compare
    against the default XLA scorer for both carry and bucketed modes."""
    import bayeslms_tpu.ops.ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    nb = OrderedDict([("m0_u0", ["w1 w2 w3", "w1 w2"]), ("m0_u1", ["w5"]),
                      ("m1_u0", ["w7 w8"])])
    sfn = lambda k: k.split("_")[0]

    for model_kind in ("LSTM", "Transformer"):
        if model_kind == "LSTM":
            cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8,
                              dropout=0.0)
        else:
            cfg = _tm_cfg()
        model = build_model(cfg)
        params = init_params(model, cfg)
        for carry in (True, False):
            rcfg = RescoreConfig(carry_over=carry, max_hyp_len=16, batch_size=4)
            ref = BatchScorer(cfg, params, rcfg).score_nbest(nb, W2I, stream_fn=sfn)
            fused = BatchScorer(cfg, params, rcfg)
            fused.use_fused_ce = True
            got = fused.score_nbest(nb, W2I, stream_fn=sfn)
            for k in nb:
                for (h1, s1), (h2, s2) in zip(ref[k], got[k]):
                    assert h1 == h2
                    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=2e-4,
                                               err_msg=f"{model_kind} carry={carry} {k}")


def test_xl_mems_scorer_exact_vs_full_context():
    """RescoreConfig.xl_mems: every hypothesis of utterance u>1 scores
    exactly as a full-context forward over [prev first-hyp input; hyp]
    (positions aligned), and utterance 1 scores as plain."""
    import os
    os.environ["BAYESLM_FUSED_CE"] = "0"
    try:
        from collections import OrderedDict
        import jax.numpy as jnp
        import optax
        from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
        from bayeslms_tpu.rescore.nbest import encode_hyp
        from bayeslms_tpu.rescore.scorer import BatchScorer

        V = 30
        cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=8, nhid=16,
                          nlayers=2, nhead=2, dropout=0.0)
        model = build_model(cfg)
        params = init_params(model, cfg)
        w2i = {"<s>": 1, "<unk>": 0}
        for i in range(2, V):
            w2i[f"w{i}"] = i

        nbest = OrderedDict()
        nbest["u1"] = ["w2 w3 w4", "w5 w6"]
        nbest["u2"] = ["w7 w8 w9 w10", "w11 w12"]

        scorer = BatchScorer(cfg, params, RescoreConfig(xl_mems=True, max_hyp_len=16))
        got = scorer.score_nbest(nbest, w2i)

        prev_ids, _, _, _ = encode_hyp(nbest["u1"][0], w2i)
        for j, hyp in enumerate(nbest["u2"]):
            x, y, _, _ = encode_hyp(hyp, w2i)
            full = jnp.asarray(np.array(prev_ids + x, np.int32)[:, None])
            logits = model.apply({"params": params}, full, deterministic=True)
            tail = logits[len(prev_ids):, 0]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                tail, jnp.asarray(np.array(y, np.int32))
            ).sum()
            np.testing.assert_allclose(got["u2"][j][1], float(ce), rtol=1e-4)

        # utterance 1 = plain scoring
        for j, hyp in enumerate(nbest["u1"]):
            x, y, _, _ = encode_hyp(hyp, w2i)
            logits = model.apply(
                {"params": params}, jnp.asarray(np.array(x, np.int32)[:, None]),
                deterministic=True,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, 0], jnp.asarray(np.array(y, np.int32))
            ).sum()
            np.testing.assert_allclose(got["u1"][j][1], float(ce), rtol=1e-4)
    finally:
        os.environ.pop("BAYESLM_FUSED_CE", None)


def test_oov_counting():
    """encode_hyp counts context+hypothesis words mapped to <unk>, and the
    scorer tallies them per-utterance/total (dev scorer `…copy.py`:123-144,
    total printed at :409)."""
    x, y, nc, n_oov = encode_hyp("w1 OOVA w2 OOVB", W2I)
    assert n_oov == 2
    assert x == [0, W2I["w1"], 1, W2I["w2"], 1]
    # context OOVs count too (within the spliced window only)
    _, _, nc, n_oov = encode_hyp("w1", W2I, context="ZZZ w9 QQQ", splice_len=2)
    assert nc == 2 and n_oov == 1  # window = [w9, QQQ]

    nb = OrderedDict([("u1", ["w1 BAD w3", "w1 w2"]), ("u2", ["BAD WORSE"])])
    cfg = _tm_cfg()
    model = build_model(cfg)
    params = init_params(model, cfg)
    sc = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16))
    sc.score_nbest(nb, W2I)
    assert sc.oov_stats == {"total": 3, "per_utt": {"u1": 1, "u2": 2}}
    # LSTM carry-over path exposes the same stats
    lcfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    lsc = BatchScorer(lcfg, init_params(build_model(lcfg), lcfg),
                      RescoreConfig(max_hyp_len=16, carry_over=True))
    lsc.score_nbest(nb, W2I)
    assert lsc.oov_stats["total"] == 3
