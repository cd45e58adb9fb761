"""Golden parity against the REFERENCE's own stochastic torch classes.

Imports /root/reference/steps/pytorchnn/model.py directly (torch CPU),
instantiates every stochastic container the recipes can build, maps its
state_dict into this framework via import_torch_state_dict, and asserts

  1. eval-mode logit parity (eval = posterior mean, deterministic in both
     frameworks), and
  2. kl_divergence() VALUE parity, replicating the exact train.py:335-399
     dispatch per uncertainty/position.

This converts the "quirk-faithful" docstring claims into checked facts for
all 4x2 uncertainty/model configs (VERDICT round-1, missing item #1).
"""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bayeslms_tpu import ModelConfig, build_model, init_params
from bayeslms_tpu.core.checkpoint import import_torch_state_dict, partial_update
from bayeslms_tpu.core.registry import sum_losses
from bayeslms_tpu.models.lstm_lm import init_hidden

REF_DIR = "/root/reference/steps/pytorchnn"

V, T, B = 30, 9, 2
E = H = 12  # reference len-3/len-4 GP-LSTM stacks require emsize == nhid
FF, HEADS = 24, 2


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "ref_model", os.path.join(REF_DIR, "model.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_model"] = mod
    spec.loader.exec_module(mod)
    return mod


def _import_params(tm, cfg, model):
    params = init_params(model, cfg, seq_len=T, batch=B)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = import_torch_state_dict(sd, cfg)
    params, updated = partial_update(params, imported)
    return params, updated, sd


def _our_logits_rnn(model, cfg, params, toks):
    logits, _ = model.apply(
        {"params": params}, jnp.asarray(toks), init_hidden(2, B, cfg.nhid),
        deterministic=True,
    )
    return np.asarray(logits)


def _our_kl(model, params, args, deterministic=True):
    rngs = {"sample": jax.random.key(7), "dropout": jax.random.key(8)}
    _, var = model.apply(
        {"params": params}, *args, deterministic=deterministic,
        mutable=("losses",), rngs=rngs,
    )
    return float(sum_losses(var.get("losses", {})))


# --------------------------------------------------------------- RNN family

@pytest.mark.parametrize("pos", [1, 2, 3, 4, 5])
def test_bayes_rnn_golden(ref, pos):
    torch.manual_seed(10 + pos)
    tm = ref.BayesRNNModel("LSTM", V, E, H, 2, dropout=0.0, tie_weights=True,
                           bayes_pos=pos).eval()
    toks = torch.randint(0, V, (T, B))
    with torch.no_grad():
        out, _ = tm(toks, tm.init_hidden(B))

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                      uncertainty="Bayesian", l_bayes_pos=pos)
    model = build_model(cfg)
    params, updated, _ = _import_params(tm, cfg, model)
    assert len(updated) >= 10, updated

    ours = _our_logits_rnn(model, cfg, params, toks.numpy())
    np.testing.assert_allclose(ours, out.numpy().reshape(T, B, V),
                               rtol=1e-4, atol=1e-5)

    ref_kl = float(tm.rnn.kl_divergence())
    np.testing.assert_allclose(
        _our_kl(model, params, (jnp.asarray(toks.numpy()), init_hidden(2, B, H))),
        ref_kl, rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize(
    "gp", ["10", "13", "21", "32", "43", "52", "63", "73", "14", "633", "6360"]
)
def test_gauss_rnn_golden(ref, gp):
    torch.manual_seed(hash(gp) % 1000)
    tm = ref.GaussRNNModel("LSTM", V, E, H, 2, dropout=0.0, tie_weights=True,
                           gauss_pos=gp).eval()
    toks = torch.randint(0, V, (T, B))
    h0 = torch.zeros(2, B, H)
    with torch.no_grad():
        out, _ = tm(toks, (h0, h0))

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                      uncertainty="Gaussian", l_gauss_pos=gp)
    model = build_model(cfg)
    params, updated, sd = _import_params(tm, cfg, model)
    assert len(updated) >= len(sd) - 2, updated  # tied decoder.weight skipped

    ours = _our_logits_rnn(model, cfg, params, toks.numpy())
    np.testing.assert_allclose(ours, out.numpy().reshape(T, B, V),
                               rtol=2e-4, atol=1e-5)

    # KL dispatch train.py:366-376
    ref_kl = 0.0
    if int(gp[0]) > 0 and 0 < int(gp[1]) <= 3:
        if len(gp) < 3:
            ref_kl = float(tm.rnn.rnn[0].gpnn.kl_divergence())
        elif len(gp) == 3:
            ref_kl = float(tm.rnn.rnn[1].gpnn.kl_divergence())
        else:
            ref_kl = float(tm.rnn.rnn[0].gpnn.kl_divergence()) + float(
                tm.rnn.rnn[1].gpnn.kl_divergence()
            )
    np.testing.assert_allclose(
        _our_kl(model, params, (jnp.asarray(toks.numpy()), init_hidden(2, B, H))),
        ref_kl, rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("vp", ["00", "10", "01", "11"])
def test_variational_rnn_golden(ref, vp):
    torch.manual_seed(int(vp))
    tm = ref.VariationalRNNModel("LSTM", V, E, H, 2, dropout=0.0,
                                 tie_weights=True, v_pos=vp).eval()
    toks = torch.randint(0, V, (T, B))
    h0 = torch.zeros(2, B, H)
    with torch.no_grad():
        out, _ = tm(toks, (h0, h0))

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                      uncertainty="Variational", l_v_pos=vp)
    model = build_model(cfg)
    params, updated, sd = _import_params(tm, cfg, model)
    # tied decoder.weight is skipped; our VNN params exist only for layers
    # whose v_pos digit is 1 (flax creates params on use)
    n_unused_vnn = vp.count("0")
    assert len(updated) >= len(sd) - 1 - n_unused_vnn, updated

    ours = _our_logits_rnn(model, cfg, params, toks.numpy())
    np.testing.assert_allclose(ours, out.numpy().reshape(T, B, V),
                               rtol=2e-4, atol=1e-5)

    # KL dispatch train.py:377-385 — reference VNN.kl_divergence reads the
    # hidden stored by the forward above.
    ref_kl = 0.0
    if int(vp[0]) == 1:
        ref_kl += float(tm.rnn.rnn[0].vnn.kl_divergence())
    if int(vp[1]) == 1:
        ref_kl += float(tm.rnn.rnn[1].vnn.kl_divergence())
    np.testing.assert_allclose(
        _our_kl(model, params, (jnp.asarray(toks.numpy()), init_hidden(2, B, H))),
        ref_kl, rtol=1e-5, atol=1e-7,
    )


# ------------------------------------------------------- Transformer family

@pytest.mark.parametrize("pos", ["FFN", "MHA", "EMB", "none"])
def test_bayes_transformer_golden(ref, pos):
    torch.manual_seed(len(pos))
    tm = ref.BayesTransformerModel(V, E, HEADS, FF, 2, dropout=0.0,
                                   tie_weights=True, bayes_pos=pos).eval()
    toks = torch.randint(0, V, (T, B))
    with torch.no_grad():
        out = tm(toks)

    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=FF,
                      nlayers=2, nhead=HEADS, dropout=0.0,
                      uncertainty="Bayesian", t_bayes_pos=pos)
    model = build_model(cfg)
    params, updated, sd = _import_params(tm, cfg, model)
    assert len(updated) >= len(sd) - 2, updated  # pos_encoder.pe is a buffer

    ours = model.apply({"params": params}, jnp.asarray(toks.numpy()),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), rtol=2e-4, atol=2e-4)

    # KL dispatch train.py:340-356
    if pos == "FFN":
        ref_kl = float(tm.transformerlayers[0].linear2.kl_divergence())
    elif pos == "MHA":
        ref_kl = float(tm.transformerlayers[0].self_attn.o_net.kl_divergence())
    elif pos == "EMB":
        ref_kl = float(tm.embed_kl_divergence())
    else:
        ref_kl = 0.0
    np.testing.assert_allclose(
        _our_kl(model, params, (jnp.asarray(toks.numpy()),)),
        ref_kl, rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("gp", [0, 1, 2, 3, 4])
def test_gauss_transformer_golden(ref, gp):
    torch.manual_seed(20 + gp)
    tm = ref.GaussTransformerModel(V, E, HEADS, FF, 2, dropout=0.0,
                                   tie_weights=True, gauss_pos=gp).eval()
    toks = torch.randint(0, V, (T, B))
    with torch.no_grad():
        out = tm(toks)

    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=FF,
                      nlayers=2, nhead=HEADS, dropout=0.0,
                      uncertainty="Gaussian", t_gauss_pos=gp)
    model = build_model(cfg)
    params, updated, sd = _import_params(tm, cfg, model)
    # unmapped by design: pos_encoder.pe buffer, tied decoder.weight, and the
    # reference layer's UNUSED linear1 (its forward routes through gpnn
    # instead, model.py:2283) which our layer doesn't create
    assert len(updated) >= len(sd) - 4, updated

    ours = model.apply({"params": params}, jnp.asarray(toks.numpy()),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), rtol=2e-4, atol=2e-4)

    # KL dispatch train.py:359-365: only 1 <= pos <= 3
    ref_kl = (
        float(tm.transformerlayers[0].gpnn.kl_divergence()) if 1 <= gp <= 3 else 0.0
    )
    np.testing.assert_allclose(
        _our_kl(model, params, (jnp.asarray(toks.numpy()),)),
        ref_kl, rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("vp", [0, 1, 2, 3])
def test_variational_transformer_golden(ref, vp):
    N = 4
    torch.manual_seed(30 + vp)
    tm = ref.VTransformerModel(V, E, HEADS, FF, N, dropout=0.0,
                               tie_weights=True, v_pos=vp).eval()
    toks = torch.randint(0, V, (T, B))
    with torch.no_grad():
        out = tm(toks)

    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=FF,
                      nlayers=N, nhead=HEADS, dropout=0.0,
                      uncertainty="Variational", t_v_pos=vp)
    model = build_model(cfg)
    params, updated, sd = _import_params(tm, cfg, model)
    assert len(updated) >= len(sd) - 2, updated

    # layer-count off-by-one parity: same number of encoder layers
    n_ref_layers = len(tm.transformerlayers)
    n_our_layers = len({k.split("/")[0] for k in
                        ("/".join(p) for p in _flat_paths(params))
                        if k.startswith("layers_")})
    assert n_our_layers == n_ref_layers

    ours = model.apply({"params": params}, jnp.asarray(toks.numpy()),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), rtol=2e-4, atol=2e-4)


def _flat_paths(params):
    from flax.traverse_util import flatten_dict

    return list(flatten_dict(params).keys())


@pytest.mark.parametrize("vp", [1, 2, 3])
def test_variational_transformer_kl_golden(ref, vp):
    """KL gated on training & seq_len==100 (model.py:2770-2781). The
    reference's training-mode FORWARD at T=100 crashes on the latent
    `self.hiddens` bug (model.py:2796), so the reference value is produced by
    an eval forward (stores self.hidden) + kl_divergence() in train mode —
    KL reads only the pre-noise hidden, identical in both modes."""
    N, T100 = 4, 100
    torch.manual_seed(40 + vp)
    tm = ref.VTransformerModel(V, E, HEADS, FF, N, dropout=0.0,
                               tie_weights=True, v_pos=vp).eval()
    toks = torch.randint(0, V, (T100, B))
    with torch.no_grad():
        tm(toks)  # stores self.hidden on each V layer
    tm.train()
    ref_kl = 0.0
    idxs = {1: (0,), 2: (1,), 3: (0, 1)}[vp]
    for i in idxs:
        ref_kl += float(tm.transformerlayers[i].kl_divergence())

    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=FF,
                      nlayers=N, nhead=HEADS, dropout=0.0,
                      uncertainty="Variational", t_v_pos=vp)
    model = build_model(cfg)
    params, _, _ = _import_params(tm, cfg, model)
    ours = _our_kl(model, params, (jnp.asarray(toks.numpy()),),
                   deterministic=False)
    np.testing.assert_allclose(ours, ref_kl, rtol=1e-4, atol=1e-7)


# ------------------------------------------------------ prior-mean KL branch

@pytest.mark.parametrize("pos", [3, 5])
def test_bayes_lstm_prior_kl_golden(ref, pos):
    """kl_divergence(prior) branch of Bayes2LSTM (model.py:767-775):
    sum-reduced weight-only KL of the layer-1 slice vs the prior means."""
    torch.manual_seed(50 + pos)
    tm = ref.BayesRNNModel("LSTM", V, E, H, 2, dropout=0.0, tie_weights=True,
                           bayes_pos=pos).eval()
    rng = np.random.default_rng(pos)
    p_hh = rng.normal(size=(4 * H, H)).astype(np.float32)
    p_ih = rng.normal(size=(4 * H, E)).astype(np.float32)
    prior = {
        "rnns.weight_hh_mean": torch.tensor(p_hh),
        "rnns.weight_ih_mean": torch.tensor(p_ih),
        "weight.theta_ih_mean": torch.tensor(p_ih),  # pos-5 key quirk
    }
    ref_kl = float(tm.rnn.kl_divergence(prior))

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                      uncertainty="Bayesian", l_bayes_pos=pos)
    model = build_model(cfg)
    params, _, _ = _import_params(tm, cfg, model)
    priors = {"core": {"weight_hh_mean_1": jnp.asarray(p_hh),
                       "weight_ih_mean_1": jnp.asarray(p_ih)}}
    _, var = model.apply(
        {"params": params, "priors": priors},
        jnp.zeros((T, B), jnp.int32), init_hidden(2, B, H),
        deterministic=True, mutable=("losses",),
    )
    ours = float(sum_losses(var["losses"]))
    np.testing.assert_allclose(ours, ref_kl, rtol=1e-5)


def test_bayes_dense_prior_kl_golden(ref):
    """BayesLinear kl_divergence(prior) (model.py:1120-1122): mean-reduced
    weight-only KL vs the prior mean. The reference branch hard-calls
    .cuda(), so the expected value is hand-computed with the same formula."""
    torch.manual_seed(60)
    tm = ref.BayesTransformerModel(V, E, HEADS, FF, 2, dropout=0.0,
                                   tie_weights=True, bayes_pos="FFN").eval()
    wm = tm.transformerlayers[0].linear2.weight_mean.detach().numpy()
    wl = tm.transformerlayers[0].linear2.weight_lgstd.detach().numpy()
    rng = np.random.default_rng(0)
    pm = rng.normal(size=wm.shape).astype(np.float32)
    expected = float(np.mean((wm - pm) ** 2 - 2 * wl + np.exp(2 * wl)) / 2)

    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=FF,
                      nlayers=2, nhead=HEADS, dropout=0.0,
                      uncertainty="Bayesian", t_bayes_pos="FFN")
    model = build_model(cfg)
    params, _, _ = _import_params(tm, cfg, model)
    priors = {"layers_0": {"linear2": {"weight_mean": jnp.asarray(pm)}}}
    _, var = model.apply(
        {"params": params, "priors": priors}, jnp.zeros((T, B), jnp.int32),
        deterministic=True, mutable=("losses",),
    )
    ours = float(sum_losses(var["losses"]))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


# --------------------------------------------------- orphaned legacy classes

@pytest.mark.parametrize("pos", [0, 1, 2, 3, 4, 5, 6, 7])
def test_gauss_lstm_legacy_golden(ref, pos):
    """Orphaned GaussLSTM positions 0-7 (model.py:1369-1606): eval forward
    of the bare core matches. (Position 8 crashes in the reference — GPNN
    has no `deterministic` kwarg — so it has no golden value; ours treats
    8 as the pos-3 behavior.)"""
    torch.manual_seed(70 + pos)
    core = ref.GaussLSTM(E, H, num_layers=2, position=pos).eval()
    rng = np.random.default_rng(pos)
    x = torch.tensor(rng.normal(size=(T, B, E)).astype(np.float32))
    h0 = torch.zeros(2, B, H)
    with torch.no_grad():
        out, _ = core(x, (h0, h0))

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                      uncertainty="Gaussian", l_gauss_legacy_pos=pos)
    from bayeslms_tpu.models.lstm_lm import GaussLSTMLegacyCore

    ours = GaussLSTMLegacyCore(cfg)
    params = ours.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(x.numpy()), init_hidden(2, B, H), deterministic=True,
    )["params"]
    sd = {f"rnn.{k}": v.detach().numpy() for k, v in core.state_dict().items()}
    from bayeslms_tpu.core.checkpoint import import_torch_state_dict as imp
    mapped = imp(sd, cfg)["core"]
    from bayeslms_tpu.core.checkpoint import partial_update
    params, updated = partial_update(params, mapped)
    assert len(updated) == len(sd), (sorted(sd), updated)

    got, _ = ours.apply({"params": params}, jnp.asarray(x.numpy()),
                        init_hidden(2, B, H), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), out.numpy(), rtol=2e-4, atol=1e-5)


def test_vlstm_legacy_golden(ref):
    """Orphaned whole-output-noise VLSTM (model.py:2582-2733): eval forward
    of the bare core matches (eval = means, no noise). Its kl_divergence
    reads a never-assigned self.hidden (the write at :2727 is commented
    out), so the KL has no reference value; ours implements the formula on
    the pre-noise output."""
    torch.manual_seed(80)
    core = ref.VLSTM(E, H, num_layers=2, position="10").eval()
    rng = np.random.default_rng(8)
    x = torch.tensor(rng.normal(size=(T, B, E)).astype(np.float32))
    h0 = torch.zeros(2, B, H)
    with torch.no_grad():
        out, _ = core(x, (h0, h0))

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                      uncertainty="Variational", l_v_pos="10", l_v_legacy=True)
    from bayeslms_tpu.models.lstm_lm import VLSTMLegacyCore

    ours = VLSTMLegacyCore(cfg)
    params = ours.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(x.numpy()), init_hidden(2, B, H), deterministic=True,
    )["params"]
    sd = {f"rnn.{k}": v.detach().numpy() for k, v in core.state_dict().items()}
    from bayeslms_tpu.core.checkpoint import import_torch_state_dict as imp
    from bayeslms_tpu.core.checkpoint import partial_update
    params, updated = partial_update(params, imp(sd, cfg)["core"])
    assert len(updated) == len(sd), (sorted(sd), updated)

    got, _ = ours.apply({"params": params}, jnp.asarray(x.numpy()),
                        init_hidden(2, B, H), deterministic=True,
                        mutable=("losses",))[0], None
    got = got[0] if isinstance(got, tuple) else got
    np.testing.assert_allclose(np.asarray(got), out.numpy(), rtol=2e-4, atol=1e-5)


# ----------------------------------------------- end-to-end scorer parity

def test_scorer_golden_vs_reference_torch_loop(ref):
    """The production scorer's batched, carry-over scores equal a
    reference-style per-hypothesis torch loop (compute_sentence_scores_
    bayes_jianwei.py:87-173, :261-274) running the reference's own
    BayesRNNModel: '<s>' framing, score = sum of token CE, hidden carried
    from the FIRST hypothesis of the previous utterance."""
    from collections import OrderedDict

    from bayeslms_tpu import RescoreConfig
    from bayeslms_tpu.rescore.scorer import BatchScorer

    torch.manual_seed(123)
    tm = ref.BayesRNNModel("LSTM", V, E, H, 2, dropout=0.0, tie_weights=True,
                           bayes_pos=2).eval()

    words = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        words[f"w{i}"] = i
    nbest = OrderedDict()
    nbest["u1"] = ["w2 w3 w4", "w5 w6"]
    nbest["u2"] = ["w7 w8 w9 w10", "w11"]
    nbest["u3"] = ["w12 w13", "w14 w15 w16 w17 w18"]

    # ---- reference-style loop (torch)
    ce = torch.nn.CrossEntropyLoss(reduction="sum")
    ref_scores = {}
    h = tm.init_hidden(1)
    carry = h
    for utt, hyps in nbest.items():
        for j, hyp in enumerate(hyps):
            inp = ["<s>"] + hyp.split()
            out = hyp.split() + ["<s>"]
            x = torch.tensor([[words[w]] for w in inp])
            y = torch.tensor([words[w] for w in out])
            with torch.no_grad():
                logits, new_h = tm(x, carry)
            ref_scores[(utt, j)] = float(ce(logits.view(-1, V), y))
            if j == 0:
                next_carry = new_h
        carry = next_carry

    # ---- ours: batched + jitted with imported weights
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                      uncertainty="Bayesian", l_bayes_pos=2)
    model = build_model(cfg)
    params, _, _ = _import_params(tm, cfg, model)
    scorer = BatchScorer(cfg, params, RescoreConfig(carry_over=True, max_hyp_len=16))
    got = scorer.score_nbest(nbest, words)
    for utt, hyps in nbest.items():
        for j in range(len(hyps)):
            np.testing.assert_allclose(
                got[utt][j][1], ref_scores[(utt, j)], rtol=2e-4,
                err_msg=f"{utt} hyp {j}",
            )


def test_scorer_golden_transformer(ref):
    """Bucketed transformer scoring == the reference torch model's per-hyp
    scores (Bayes FFN container, eval mode)."""
    from collections import OrderedDict

    from bayeslms_tpu import RescoreConfig
    from bayeslms_tpu.rescore.scorer import BatchScorer

    torch.manual_seed(321)
    tm = ref.BayesTransformerModel(V, E, HEADS, FF, 2, dropout=0.0,
                                   tie_weights=True, bayes_pos="FFN").eval()
    words = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        words[f"w{i}"] = i
    nbest = OrderedDict()
    nbest["u1"] = ["w2 w3 w4", "w5 w6 w7 w8 w9 w10 w11"]
    nbest["u2"] = ["w12"]

    ce = torch.nn.CrossEntropyLoss(reduction="sum")
    ref_scores = {}
    for utt, hyps in nbest.items():
        for j, hyp in enumerate(hyps):
            inp = ["<s>"] + hyp.split()
            out = hyp.split() + ["<s>"]
            x = torch.tensor([[words[w]] for w in inp])
            y = torch.tensor([words[w] for w in out])
            with torch.no_grad():
                logits = tm(x)
            ref_scores[(utt, j)] = float(ce(logits.view(-1, V), y))

    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=FF,
                      nlayers=2, nhead=HEADS, dropout=0.0,
                      uncertainty="Bayesian", t_bayes_pos="FFN")
    model = build_model(cfg)
    params, _, _ = _import_params(tm, cfg, model)
    scorer = BatchScorer(cfg, params, RescoreConfig(max_hyp_len=16))
    got = scorer.score_nbest(nbest, words)
    for utt, hyps in nbest.items():
        for j in range(len(hyps)):
            np.testing.assert_allclose(
                got[utt][j][1], ref_scores[(utt, j)], rtol=2e-4,
                err_msg=f"{utt} hyp {j}",
            )
