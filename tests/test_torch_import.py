"""Golden parity: reference-architecture torch models' state_dicts imported
into this framework reproduce the SAME logits (eval mode).

The torch models here are built from torch built-ins exactly as the
reference containers do (RNNModel = Embedding + nn.LSTM + tied Linear,
model.py:23-73; TransformerModel = Embedding*sqrt(d) + PositionalEncoding +
torch TransformerEncoder(gelu) + tied Linear, model.py:121-171), so logit
parity proves a reference user can load their trained checkpoints and get
identical scores.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from bayeslms_tpu import ModelConfig, build_model, init_params
from bayeslms_tpu.core.checkpoint import import_torch_state_dict, partial_update
from bayeslms_tpu.models.lstm_lm import init_hidden

V, T, B = 30, 9, 2
torch.manual_seed(0)


def test_rnnmodel_lstm_logit_parity():
    E = H = 12

    class TorchRNNModel(nn.Module):  # reference RNNModel structure
        def __init__(self):
            super().__init__()
            self.encoder = nn.Embedding(V, E)
            self.rnn = nn.LSTM(E, H, 2)
            self.decoder = nn.Linear(H, V)
            self.decoder.weight = self.encoder.weight

        def forward(self, x, hidden):
            emb = self.encoder(x)
            out, hidden = self.rnn(emb, hidden)
            return self.decoder(out), hidden

    tm = TorchRNNModel().eval()
    toks = torch.randint(0, V, (T, B))
    h0 = torch.zeros(2, B, H)
    with torch.no_grad():
        ref, _ = tm(toks, (h0, h0))

    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    imported = import_torch_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg
    )
    params, updated = partial_update(params, imported)
    assert len(updated) >= 10, updated

    logits, _ = model.apply(
        {"params": params}, jnp.asarray(toks.numpy()),
        init_hidden(2, B, H), deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_transformermodel_logit_parity():
    E, heads, FF, L = 12, 2, 24, 2

    class TorchTM(nn.Module):  # reference TransformerModel structure
        def __init__(self):
            super().__init__()
            self.encoder = nn.Embedding(V, E)
            layer = nn.TransformerEncoderLayer(E, heads, FF, dropout=0.0,
                                               activation="gelu")
            self.transformerlayers = nn.TransformerEncoder(layer, L)
            self.decoder = nn.Linear(E, V)
            self.decoder.weight = self.encoder.weight
            pe = torch.zeros(5000, E)
            pos = torch.arange(0, 5000, dtype=torch.float).unsqueeze(1)
            div = torch.exp(torch.arange(0, E, 2).float() * (-math.log(1e4) / E))
            pe[:, 0::2] = torch.sin(pos * div)
            pe[:, 1::2] = torch.cos(pos * div)
            self.register_buffer("pe", pe.unsqueeze(1))

        def forward(self, src):
            mask = torch.zeros(len(src), len(src)).masked_fill(
                torch.triu(torch.ones(len(src), len(src)), 1).bool(), float("-inf")
            )
            x = self.encoder(src) * math.sqrt(E) + self.pe[: len(src)]
            x = self.transformerlayers(x, mask)
            return self.decoder(x)

    tm = TorchTM().eval()
    toks = torch.randint(0, V, (T, B))
    with torch.no_grad():
        ref = tm(toks)

    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=FF,
                      nlayers=L, nhead=heads, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    imported = import_torch_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg
    )
    params, updated = partial_update(params, imported)
    assert len(updated) >= 2 + L * 12, updated

    logits = model.apply({"params": params}, jnp.asarray(toks.numpy()),
                         deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_bayes_lstm_mean_lgstd_roundtrip():
    """Bayes2LSTM-style mean/lgstd keys map onto the Bayes core params."""
    E = H = 8
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H,
                      uncertainty="Bayesian", l_bayes_pos=2, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)

    rng = np.random.default_rng(0)
    sd = {
        "encoder.weight": rng.normal(size=(V, E)).astype(np.float32),
        "decoder.bias": rng.normal(size=(V,)).astype(np.float32),
        "rnn.weight_ih_mean_1": rng.normal(size=(4 * H, E)).astype(np.float32),
        "rnn.weight_hh_lgstd_1": rng.normal(size=(H, H)).astype(np.float32),
    }
    imported = import_torch_state_dict(sd, cfg)
    params, updated = partial_update(params, imported)
    assert set(updated) >= {
        "embedding", "decoder_b", "core/weight_ih_mean_1", "core/weight_hh_lgstd_1",
    }
    np.testing.assert_array_equal(
        np.asarray(params["core"]["weight_hh_lgstd_1"]), sd["rnn.weight_hh_lgstd_1"]
    )
