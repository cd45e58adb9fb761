"""Batched rescorer parity vs a straight per-hypothesis loop implementing the
reference scorer semantics (batch-1, hidden carry-over, summed token CE)."""

import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
from bayeslms_tpu.models.lstm_lm import init_hidden
from bayeslms_tpu.rescore.nbest import encode_hyp, load_nbest, write_scores
from bayeslms_tpu.rescore.scorer import BatchScorer

V = 40
WORDS = ["<s>", "<unk>"] + [f"w{i}" for i in range(V - 2)]
W2I = {w: i for i, w in enumerate(WORDS)}

NBEST = OrderedDict(
    [
        ("utt1", ["w1 w2 w3", "w1 w2", "w1 w2 w3 w4 w5"]),
        ("utt2", ["w9", "w9 w8 w7 w6"]),
        ("utt3", ["w3 w3 w3 w1 w0 w2 w4", "w3"]),
    ]
)


def ref_loop_scores(model, params, cfg, carry_over):
    """Reference semantics: per-hyp batch-1 scoring, score = len * mean_CE,
    hidden init from previous utterance's FIRST hyp."""
    scores = OrderedDict()
    hidden = init_hidden(cfg.nlayers, 1, cfg.nhid)
    for key, hyps in NBEST.items():
        cached = []
        scores[key] = []
        for hyp in hyps:
            x, y, _, _ = encode_hyp(hyp, W2I)
            toks = jnp.asarray(np.array(x, np.int32)[:, None])
            tgt = jnp.asarray(np.array(y, np.int32))
            if cfg.is_transformer:
                logits = model.apply({"params": params}, toks, deterministic=True)
            else:
                h0 = hidden if carry_over else init_hidden(cfg.nlayers, 1, cfg.nhid)
                logits, new_h = model.apply({"params": params}, toks, h0, deterministic=True)
                cached.append(new_h)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, 0, :], tgt
            )
            scores[key].append((hyp, float(ce.sum())))
        if not cfg.is_transformer and carry_over:
            hidden = cached[0]
    return scores


def _assert_same(a, b):
    for key in a:
        for (h1, s1), (h2, s2) in zip(a[key], b[key]):
            assert h1 == h2
            np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("carry", [True, False])
def test_lstm_scorer_matches_reference_loop(carry):
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    rcfg = RescoreConfig(carry_over=carry, max_hyp_len=16, batch_size=4)
    got = BatchScorer(cfg, params, rcfg).score_nbest(NBEST, W2I)
    want = ref_loop_scores(model, params, cfg, carry)
    _assert_same(want, got)


def test_transformer_scorer_matches_reference_loop():
    cfg = ModelConfig(
        model="Transformer", vocab_size=V, emsize=8, nhid=16, nlayers=2, nhead=2,
        dropout=0.0,
    )
    model = build_model(cfg)
    params = init_params(model, cfg)
    rcfg = RescoreConfig(max_hyp_len=16, batch_size=4)
    got = BatchScorer(cfg, params, rcfg).score_nbest(NBEST, W2I)
    want = ref_loop_scores(model, params, cfg, carry_over=False)
    _assert_same(want, got)


def test_logit_interpolation_matches_loop():
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    model = build_model(cfg)
    p1 = init_params(model, cfg, seed=0)
    p2 = init_params(model, cfg, seed=9)
    rcfg = RescoreConfig(carry_over=True, inter_flag=1, inter_alpha=0.8, max_hyp_len=16)
    got = BatchScorer(cfg, p1, rcfg, cfg2=cfg, params2=p2).score_nbest(NBEST, W2I)

    # reference: logits interpolated before CE, both hiddens carried
    scores = OrderedDict()
    h1 = h2 = init_hidden(cfg.nlayers, 1, cfg.nhid)
    for key, hyps in NBEST.items():
        cached = []
        scores[key] = []
        for hyp in hyps:
            x, y, _, _ = encode_hyp(hyp, W2I)
            toks = jnp.asarray(np.array(x, np.int32)[:, None])
            tgt = jnp.asarray(np.array(y, np.int32))
            l1, nh1 = model.apply({"params": p1}, toks, h1, deterministic=True)
            l2, nh2 = model.apply({"params": p2}, toks, h2, deterministic=True)
            logits = 0.8 * l1 + 0.2 * l2
            ce = optax.softmax_cross_entropy_with_integer_labels(logits[:, 0, :], tgt)
            scores[key].append((hyp, float(ce.sum())))
            cached.append((nh1, nh2))
        h1, h2 = cached[0]
    _assert_same(scores, got)


def test_nbest_io_roundtrip(tmp_path):
    p = tmp_path / "words"
    p.write_text("utt1-1 w1 w2\nutt1-2 w1\nutt2-1 w9 w9\n")
    nb = load_nbest(str(p))
    assert list(nb) == ["utt1", "utt2"]
    assert nb["utt1"] == ["w1 w2", "w1"]

    out = tmp_path / "scores"
    write_scores(OrderedDict([("utt1", [("w1 w2", 1.5), ("w1", 2.25)])]), str(out))
    assert out.read_text() == "utt1-1 1.5000\nutt1-2 2.2500\n"


def test_parallel_streams_match_per_stream_chains():
    """Grouping utterances into independent chains gives the same scores as
    scoring each chain separately with the single-chain scorer."""
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    rcfg = RescoreConfig(carry_over=True, max_hyp_len=16, carry_chunk_utts=2)

    nbest = OrderedDict(
        [
            ("m0_u0", ["w1 w2 w3", "w1 w2"]),
            ("m1_u0", ["w9", "w9 w8 w7"]),
            ("m0_u1", ["w3 w3 w1", "w3"]),
            ("m1_u1", ["w5 w6", "w5"]),
            ("m0_u2", ["w2", "w2 w4"]),
        ]
    )
    got = BatchScorer(cfg, params, rcfg).score_nbest(
        nbest, W2I, stream_fn=lambda k: k.split("_")[0]
    )
    for prefix in ("m0", "m1"):
        sub = OrderedDict((k, v) for k, v in nbest.items() if k.startswith(prefix))
        want = BatchScorer(cfg, params, rcfg).score_nbest(sub, W2I)
        for k in sub:
            for (h1, s1), (h2, s2) in zip(want[k], got[k]):
                assert h1 == h2
                np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=1e-4)


def test_packed_fused_decode_matches_xla_path(monkeypatch):
    """The padding-free fused decode (real-token gather + segment-sum) gives
    the same scores as the plain XLA path, carry and bucketed modes
    (interpret-mode pallas)."""
    from collections import OrderedDict

    import jax.numpy as jnp

    from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
    from bayeslms_tpu.ops import ce_pallas as cp
    from bayeslms_tpu.rescore.scorer import BatchScorer

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    V = 32
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=16, nhid=16, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(1)
    nbest = OrderedDict()
    for u in range(4):
        nbest[f"u{u}"] = [
            " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(2, 10)))
            for _ in range(3)
        ]

    for rc in (RescoreConfig(carry_over=True, max_hyp_len=16),
               RescoreConfig(carry_over=False, max_hyp_len=16, batch_size=8)):
        plain = BatchScorer(cfg, params, rc)
        assert not plain.use_fused_ce  # CPU platform gate
        ref = plain.score_nbest(nbest, w2i)

        fused = BatchScorer(cfg, params, rc)
        fused.use_fused_ce = True  # force the packed path under interpret
        got = fused.score_nbest(nbest, w2i)
        for k in nbest:
            np.testing.assert_allclose(
                [s for _, s in got[k]], [s for _, s in ref[k]],
                rtol=1e-4, atol=1e-5, err_msg=k,
            )


@pytest.mark.parametrize("extra", [
    dict(uncertainty="none"),
    dict(uncertainty="Bayesian", l_bayes_pos=3),
    dict(uncertainty="Gaussian", l_gauss_pos="13"),        # GP cell, layer 1
    dict(uncertainty="Gaussian", l_gauss_pos="3133"),      # GP cells both layers
    dict(uncertainty="Gaussian", l_gauss_legacy_pos=3),    # legacy GaussLSTM
    dict(uncertainty="Variational", l_v_pos="11"),
    dict(uncertainty="Variational", l_v_pos="11", l_v_legacy=True),
    dict(uncertainty="none", model="GRU"),
])
def test_packed_carry_matches_slotted(monkeypatch, extra):
    """Packed-time carry-over layout (one time-packed sequence per chunk,
    in-scan state resets at utterance starts) scores identically to the
    per-utterance slotted layout, across chains of uneven length, uneven
    hypothesis counts, chunk boundaries, over-long hypotheses, and every
    recurrent core family."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    V = 32
    kw = dict(model="LSTM", vocab_size=V, emsize=16, nhid=16, dropout=0.0)
    kw.update(extra)
    cfg = ModelConfig(**kw)
    model = build_model(cfg)
    params = init_params(model, cfg)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(7)
    nbest = OrderedDict()
    # chain A: 5 utterances, chain B: 2 — uneven; uneven hyp counts; one
    # hypothesis longer than max_hyp_len (truncation parity)
    for u in range(5):
        nbest[f"A_{u}"] = [
            " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(2, 10)))
            for _ in range(3 if u % 2 else 2)
        ]
    nbest["A_2"].append(" ".join(f"w{rng.integers(2, V)}" for _ in range(25)))
    for u in range(2):
        nbest[f"B_{u}"] = [
            " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(1, 8)))
            for _ in range(3)
        ]
    stream = lambda k: k.split("_")[0]

    rc = RescoreConfig(carry_over=True, max_hyp_len=16, carry_chunk_utts=2)
    plain = BatchScorer(cfg, params, rc)
    assert not plain._packed_allowed()  # CPU platform gate (fused CE off)
    ref = plain.score_nbest(nbest, w2i, stream_fn=stream)

    packed = BatchScorer(cfg, params, rc)
    packed.use_fused_ce = True
    assert packed._packed_allowed()
    got = packed.score_nbest(nbest, w2i, stream_fn=stream)
    for k in nbest:
        np.testing.assert_allclose(
            [s for _, s in got[k]], [s for _, s in ref[k]],
            rtol=1e-4, atol=1e-5, err_msg=k)


def test_encode_hyp_oov_semantics():
    """OOV tally counts words absent from the vocab (a literal <unk> token
    is IN-vocabulary, `…copy.py`:123-144); ids map OOVs to <unk>; the
    single-pass sentinel implementation preserves these exactly."""
    from bayeslms_tpu.rescore.nbest import encode_hyp

    w2i = {"<s>": 1, "<unk>": 0, "a": 2, "b": 3, "c": 4, "dd": 5}
    inp, tgt, nc, oov = encode_hyp("a zz <unk> c", w2i)
    assert inp == [1, 2, 0, 0, 4] and tgt == [2, 0, 0, 4, 1]
    assert nc == 0 and oov == 1  # zz only; literal <unk> is in-vocab
    # spliced context contributes to the tally; n_ctx counts its positions
    inp, tgt, nc, oov = encode_hyp("b", w2i, context="qq a", splice_len=2)
    assert nc == 2 and oov == 1 and inp == [1, 0, 2, 3]
    # backward reverses hypothesis words only
    inp, _, _, _ = encode_hyp("a b c", w2i, backward=True)
    assert inp == [1, 4, 3, 2]
    # empty hypothesis
    inp, tgt, nc, oov = encode_hyp("", w2i)
    assert inp == [1] and tgt == [1] and oov == 0


@pytest.mark.parametrize("extra", [
    dict(),
    dict(uncertainty="Bayesian", t_bayes_pos="FFN"),
    dict(uncertainty="Gaussian", t_gauss_pos=3),
    dict(uncertainty="Variational", t_v_pos=1),
])
def test_packed_tm_matches_bucketed(monkeypatch, extra):
    """Sequence-packed transformer scoring (several hyps per time column,
    per-segment positions, causal-within-segment mask) == the per-hypothesis
    bucketed path, across encoder-layer families (interpret-mode fused CE)."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    V = 32
    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=16, nhid=32,
                      nlayers=2, nhead=2, dropout=0.0, **extra)
    model = build_model(cfg)
    params = init_params(model, cfg)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(11)
    nbest = OrderedDict()
    for u in range(6):
        nbest[f"u{u}"] = [
            " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(1, 20)))
            for _ in range(3 + u % 2)
        ]
    nbest["u_long"] = [" ".join(f"w{rng.integers(2, V)}" for _ in range(40))]

    rc = RescoreConfig(carry_over=False, max_hyp_len=24, batch_size=4)
    plain = BatchScorer(cfg, params, rc)
    assert not plain._packed_nocarry_allowed()  # CPU gate (fused CE off)
    ref = plain.score_nbest(nbest, w2i)

    packed = BatchScorer(cfg, params, rc)
    packed.use_fused_ce = True
    assert packed._packed_nocarry_allowed()
    got = packed.score_nbest(nbest, w2i)
    for k in nbest:
        np.testing.assert_allclose(
            [s for _, s in got[k]], [s for _, s in ref[k]],
            rtol=1e-4, atol=1e-4, err_msg=k)


@pytest.mark.parametrize("extra", [
    dict(),
    dict(uncertainty="Bayesian", l_bayes_pos=3),
    dict(uncertainty="Gaussian", l_gauss_pos="13"),
    dict(model="GRU"),
])
def test_packed_nocarry_rnn_matches_bucketed(monkeypatch, extra):
    """No-carry recurrent scoring via the packed layout (independent
    hypotheses share time columns, ZERO-state resets at segment starts) ==
    the per-hypothesis bucketed path (interpret-mode fused CE)."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    V = 32
    kw = dict(model="LSTM", vocab_size=V, emsize=16, nhid=16, dropout=0.0)
    kw.update(extra)
    cfg = ModelConfig(**kw)
    model = build_model(cfg)
    params = init_params(model, cfg)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(13)
    nbest = OrderedDict()
    for u in range(6):
        nbest[f"u{u}"] = [
            " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(1, 20)))
            for _ in range(3)
        ]
    nbest["u_long"] = [" ".join(f"w{rng.integers(2, V)}" for _ in range(40))]

    rc = RescoreConfig(carry_over=False, max_hyp_len=24, batch_size=4)
    plain = BatchScorer(cfg, params, rc)
    assert not plain._packed_nocarry_allowed()
    ref = plain.score_nbest(nbest, w2i)

    packed = BatchScorer(cfg, params, rc)
    packed.use_fused_ce = True
    assert packed._packed_nocarry_allowed()
    got = packed.score_nbest(nbest, w2i)
    for k in nbest:
        np.testing.assert_allclose(
            [s for _, s in got[k]], [s for _, s in ref[k]],
            rtol=1e-4, atol=1e-4, err_msg=k)


@pytest.mark.parametrize("inter_flag", [1, 2])
@pytest.mark.parametrize("mode", ["carry", "nocarry", "tm"])
@pytest.mark.parametrize("layout", ["packed", "slotted"])
def test_fused_interp_matches_unfused(monkeypatch, inter_flag, mode, layout):
    """Interpolated rescoring rides the fused-CE fast paths (packed AND
    slotted layouts): logit-level interpolation (inter_flag=1, ref :157-163)
    is ONE fused kernel call over concatenated hiddens against the
    pre-scaled concat decoder  [h1, h2] @ concat(a*W1, (1-a)*W2)';
    score-level (inter_flag=2, `…copy.py`:244-264) is two fused calls
    combined a*ce1+(1-a)*ce2. Parity vs the unfused interp path, with a
    second model of DIFFERENT geometry (the ref loads an independent
    baseline checkpoint, :457-472)."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)
    if layout == "slotted":  # force the bucketed/slotted fused branches
        monkeypatch.setenv("BAYESLM_PACKED_CARRY", "0")
        monkeypatch.setenv("BAYESLM_PACKED_TM", "0")
        monkeypatch.setenv("BAYESLM_PACKED_NOCARRY", "0")

    V = 32
    if mode == "tm":
        cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=16,
                          nhid=32, nlayers=2, nhead=2, dropout=0.0)
        cfg2 = ModelConfig(model="Transformer", vocab_size=V, emsize=24,
                           nhid=16, nlayers=1, nhead=2, dropout=0.0)
    else:
        cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=16, nhid=16,
                          dropout=0.0)
        cfg2 = ModelConfig(model="LSTM", vocab_size=V, emsize=24, nhid=24,
                           nlayers=1, dropout=0.0)
    p1 = init_params(build_model(cfg), cfg, seed=0)
    p2 = init_params(build_model(cfg2), cfg2, seed=9)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(17)
    nbest = OrderedDict()
    for u in range(5):
        nbest[f"A_{u}" if u % 2 else f"B_{u}"] = [
            " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(1, 12)))
            for _ in range(3)
        ]
    nbest["A_9"] = [" ".join(f"w{rng.integers(2, V)}" for _ in range(30))]
    stream = lambda k: k.split("_")[0]

    carry = mode == "carry"
    rc = RescoreConfig(carry_over=carry, max_hyp_len=16, batch_size=4,
                       carry_chunk_utts=2, inter_flag=inter_flag,
                       inter_alpha=0.8)
    sfn = stream if carry else None
    plain = BatchScorer(cfg, p1, rc, cfg2=cfg2, params2=p2)
    assert not plain.use_fused_ce  # CPU platform gate
    ref = plain.score_nbest(nbest, w2i, stream_fn=sfn)

    fused = BatchScorer(cfg, p1, rc, cfg2=cfg2, params2=p2)
    fused.use_fused_ce = True
    if layout == "packed":
        if carry:
            assert fused._packed_allowed()
        else:
            assert fused._packed_nocarry_allowed()
    got = fused.score_nbest(nbest, w2i, stream_fn=sfn)
    for k in nbest:
        np.testing.assert_allclose(
            [s for _, s in got[k]], [s for _, s in ref[k]],
            rtol=1e-4, atol=1e-4, err_msg=k)


def test_fused_interp_gate_requires_same_family(monkeypatch):
    """A cross-family model pair (LSTM main + Transformer baseline) cannot
    share a batch layout, so the fused-interp gate must refuse it even on a
    fused-capable platform."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "fused_ce_ok", lambda D: True)
    V = 32
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=16, nhid=16,
                      dropout=0.0)
    cfg2 = ModelConfig(model="Transformer", vocab_size=V, emsize=16, nhid=32,
                       nlayers=1, nhead=2, dropout=0.0)
    p1 = init_params(build_model(cfg), cfg, seed=0)
    p2 = init_params(build_model(cfg2), cfg2, seed=1)
    rc = RescoreConfig(carry_over=False, inter_flag=1, inter_alpha=0.8)
    sc = BatchScorer(cfg, p1, rc, cfg2=cfg2, params2=p2)
    assert not sc.use_fused_ce
    # same family flips it on
    sc2 = BatchScorer(cfg, p1, rc, cfg2=cfg, params2=p1)
    assert sc2.use_fused_ce


@pytest.mark.parametrize("family", ["tm", "lstm"])
def test_fused_mc_matches_legacy(monkeypatch, family):
    """Fused MC-average scoring (per-draw fused CE on gathered real token
    positions, then a target-only log-mean-exp) == the legacy per-row path
    that materializes the (K, T, B, V) log-softmax stack. Row j's draws are
    split(key(j), K) in BOTH implementations, so the same posterior samples
    are averaged and the comparison is tolerance-tight."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    V = 32
    if family == "tm":
        cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=16,
                          nhid=32, nlayers=2, nhead=2, dropout=0.0,
                          uncertainty="Variational", t_v_pos=1, v_seq_len=24)
    else:
        cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=16, nhid=16,
                          dropout=0.0, uncertainty="Bayesian", l_bayes_pos=3)
    params = init_params(build_model(cfg), cfg)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(23)
    nbest = OrderedDict()
    for u in range(5):
        nbest[f"u{u}"] = [
            " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(1, 12)))
            for _ in range(3)
        ]

    rc = RescoreConfig(carry_over=False, max_hyp_len=24, batch_size=4,
                       mc_samples=3)
    legacy = BatchScorer(cfg, params, rc)
    assert not legacy.use_fused_mc  # CPU platform gate
    ref = legacy.score_nbest(nbest, w2i)

    fused = BatchScorer(cfg, params, rc)
    fused.use_fused_mc = True
    got = fused.score_nbest(nbest, w2i)
    for k in nbest:
        np.testing.assert_allclose(
            [s for _, s in got[k]], [s for _, s in ref[k]],
            rtol=1e-4, atol=1e-4, err_msg=k)


def test_native_encode_matches_python():
    """NativeEncoder batch encoding == encode_hyp exactly: ids, BOS framing,
    OOV tally (literal <unk> in-vocab), unicode words, empty hypothesis,
    backward reversal, and an arbitrary (non-dense) id mapping."""
    import subprocess

    from bayeslms_tpu.data import native
    from bayeslms_tpu.rescore.nbest import encode_all_native

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "tools")], check=True,
                   capture_output=True)
    assert native.available()
    w2i = {"<s>": 3, "<unk>": 7, "a": 0, "b": 12, "días": 5, "日本": 9}
    enc = native.NativeEncoder.build(w2i)
    assert enc is not None
    hyps = ["a b días", "zz <unk> 日本", " ", "b b zz qq a", ""]
    nb = OrderedDict([("u1", hyps[:2]), ("u2", hyps[2:])])
    for backward in (False, True):
        enc_all = encode_all_native(nb, enc, backward=backward)
        got = enc_all["u1"] + enc_all["u2"]
        for h, (gi, gt, gn, go) in zip(hyps, got):
            pi, pt, pn, po = encode_hyp(h, w2i, backward=backward)
            assert list(gi) == pi and list(gt) == pt, h
            assert gn == pn and go == po, h
    # scoring end-to-end equality: native-encoded arrays through the full
    # scorer == python-list encoding (same model, same nbest)
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    params = init_params(build_model(cfg), cfg)
    rcfg = RescoreConfig(carry_over=True, max_hyp_len=16, batch_size=4)
    a = BatchScorer(cfg, params, rcfg).score_nbest(NBEST, W2I)
    os.environ["BAYESLM_NATIVE_ENCODE"] = "0"
    try:
        b = BatchScorer(cfg, params, rcfg).score_nbest(NBEST, W2I)
    finally:
        os.environ.pop("BAYESLM_NATIVE_ENCODE", None)
    _assert_same(a, b)


@pytest.mark.parametrize("mode", ["carry_lstm", "nocarry_lstm", "tm"])
def test_packed_splice_excludes_context(monkeypatch, mode):
    """Spliced-context tokens condition the model but are EXCLUDED from the
    score in the packed layouts too (regression: the fused gather plan's
    keep test used the packed-offset-shifted absolute time, so any
    hypothesis placed at t_off >= n_ctx scored its context tokens)."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    Vv = 32
    if mode == "tm":
        cfg = ModelConfig(model="Transformer", vocab_size=Vv, emsize=16,
                          nhid=32, nlayers=2, nhead=2, dropout=0.0)
    else:
        cfg = ModelConfig(model="LSTM", vocab_size=Vv, emsize=16, nhid=16,
                          dropout=0.0)
    params = init_params(build_model(cfg), cfg)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, Vv):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(5)
    nbest = OrderedDict()
    for u in range(5):  # >1 utterance per chain => t_off > 0 slots exist
        nbest[f"A_{u}"] = [
            " ".join(f"w{rng.integers(2, Vv)}" for _ in range(rng.integers(2, 9)))
            for _ in range(2 + u % 2)
        ]
    carry = mode == "carry_lstm"
    rc = RescoreConfig(carry_over=carry, max_hyp_len=16, splice_len=3,
                       carry_chunk_utts=2, batch_size=4)
    plain = BatchScorer(cfg, params, rc)
    assert not (plain._packed_allowed() or plain._packed_nocarry_allowed())
    ref = plain.score_nbest(nbest, w2i)

    packed = BatchScorer(cfg, params, rc)
    packed.use_fused_ce = True
    assert packed._packed_allowed() if carry else packed._packed_nocarry_allowed()
    got = packed.score_nbest(nbest, w2i)
    for k in nbest:
        np.testing.assert_allclose(
            [s for _, s in got[k]], [s for _, s in ref[k]],
            rtol=1e-4, atol=1e-4, err_msg=k)
