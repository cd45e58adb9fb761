"""NAS: supernets run, KL flows, the architect moves arch weights, and the
search loop produces a softmax decision matrix."""

import jax
import jax.numpy as jnp
import numpy as np

from bayeslms_tpu import ModelConfig, TrainConfig
from bayeslms_tpu.nas.search import SearchRunner
from bayeslms_tpu.nas.supernet import gumbel_softmax, init_arch_weights


class TinyCorpus:
    def __init__(self, V=20, n=900):
        t = np.arange(n)
        self.train = ((t * 3) % (V - 2) + 1).astype(np.int32)
        self.valid = self.train[:300].copy()
        self.test = self.train[:300].copy()


def test_gumbel_softmax_properties():
    logits = jnp.asarray([[2.0, -2.0]])
    w = gumbel_softmax(logits, jax.random.key(0), temperature=5.0)
    assert w.shape == (1, 2)
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-6)
    # different keys -> different samples
    w2 = gumbel_softmax(logits, jax.random.key(1), temperature=5.0)
    assert not np.allclose(np.asarray(w), np.asarray(w2))


def _run_search(model, mode, unrolled=False):
    cfg = ModelConfig(
        model=model, vocab_size=20, emsize=8, nhid=8 if model == "LSTM" else 16,
        nlayers=2, nhead=2, dropout=0.0,
    )
    tcfg = TrainConfig(lr=0.5, batch_size=4, epochs=1, seq_len=8, seed=0)
    runner = SearchRunner(cfg, tcfg, mode=mode, unrolled=unrolled)
    res = runner.run(TinyCorpus(), log=lambda *a: None)
    slots = 1 if model == "Transformer" else 4
    assert res.arch_softmax.shape == (2, slots, 2)
    np.testing.assert_allclose(res.arch_softmax.sum(-1), 1.0, rtol=1e-5)
    return res


def test_search_transformer_bayes():
    res = _run_search("Transformer", "bayes")
    # arch weights must have moved off the near-uniform init
    assert np.abs(res.arch_softmax - 0.5).max() > 1e-4


def test_search_lstm_bayes_unrolled():
    res = _run_search("LSTM", "bayes", unrolled=True)
    assert np.abs(res.arch_softmax - 0.5).max() > 1e-4


def test_search_transformer_gauss():
    _run_search("Transformer", "gauss")


def test_search_lstm_gauss():
    _run_search("LSTM", "gauss")


def test_search_derive_and_finetune():
    """The search result is CONSUMABLE: derive() hard-selects the argmax
    branches (exact 1/0 weights) and finetune() trains that fixed
    architecture — loss must drop on the periodic stream. Also covers the
    per-epoch hidden re-init + cross-batch carry (reference
    train_search_bayes.py:245-246, :272-273)."""
    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8,
                      nlayers=2, nhead=2, dropout=0.0)
    tcfg = TrainConfig(lr=0.5, batch_size=4, epochs=1, seq_len=8, seed=0)
    runner = SearchRunner(cfg, tcfg, mode="bayes")
    res = runner.run(TinyCorpus(), log=lambda *a: None)
    assert res.derived_choice.shape == (2, 4)
    hard = SearchRunner.derive(res.arch_softmax)
    w = jax.nn.softmax(hard, axis=-1)
    np.testing.assert_array_equal(np.asarray(w).argmax(-1), res.derived_choice)
    # saturated: exactly one-hot in f32
    np.testing.assert_allclose(np.asarray(w).max(-1), 1.0)

    params, _ = runner.init_params(0)
    params, losses = runner.finetune(params, hard, TinyCorpus(), steps=30)
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
