"""step_mask semantics: padded steps freeze the recurrent state, so the
final hidden equals the state at each stream's true length — the invariant
behind exact hidden carry-over in the padded batched rescorer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayeslms_tpu import ModelConfig, build_model, init_params
from bayeslms_tpu.models.lstm_lm import init_hidden

V, E, H, B = 30, 8, 8, 2


@pytest.mark.parametrize(
    "cfg",
    [
        ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0),
        ModelConfig(model="GRU", vocab_size=V, emsize=E, nhid=H, dropout=0.0),
        ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                    uncertainty="Bayesian", l_bayes_pos=3),
        ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                    uncertainty="Gaussian", l_gauss_pos="13"),
        ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0,
                    uncertainty="Variational", l_v_pos="11"),
    ],
    ids=["lstm", "gru", "bayes", "gauss", "vlstm"],
)
def test_masked_final_state_equals_unpadded(cfg):
    model = build_model(cfg)
    params = init_params(model, cfg, seq_len=6, batch=B)
    rng = np.random.default_rng(0)

    lengths = [4, 6]
    T = 6
    toks = rng.integers(0, V, size=(T, B)).astype(np.int32)
    mask = np.zeros((T, B), np.float32)
    for j, L in enumerate(lengths):
        mask[:L, j] = 1.0

    hidden = init_hidden(cfg.nlayers, B, cfg.nhid)
    # padded+masked run (eval mode: deterministic)
    _, hid_masked = model.apply(
        {"params": params}, jnp.asarray(toks), hidden, deterministic=True,
        step_mask=jnp.asarray(mask),
    )

    # per-stream unpadded runs
    for j, L in enumerate(lengths):
        h1 = init_hidden(cfg.nlayers, 1, cfg.nhid)
        _, hid_ref = model.apply(
            {"params": params}, jnp.asarray(toks[:L, j : j + 1]), h1, deterministic=True
        )
        np.testing.assert_allclose(
            np.asarray(hid_masked[0][:, j]), np.asarray(hid_ref[0][:, 0]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(hid_masked[1][:, j]), np.asarray(hid_ref[1][:, 0]),
            rtol=1e-5, atol=1e-6,
        )
