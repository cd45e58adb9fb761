"""Numerical parity vs PyTorch (CPU) for the core math.

These validate that the TPU-native ops reproduce the reference's building
blocks bit-for-bit (up to fp32 tolerance) given identical weights: the scan
LSTM/GRU vs torch's fused RNNs, the self-attention encoder layer vs torch's
TransformerEncoderLayer, and the positional-encoding table.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bayeslms_tpu.ops.attention import (
    causal_mask,
    multihead_attention,
    sinusoidal_positional_encoding,
)
from bayeslms_tpu.ops.lstm import LSTMParams, gru_layer, lstm_layer, rnn_layer

torch.manual_seed(0)
T, B, IN, H = 7, 3, 5, 6


def _np(x):
    return x.detach().numpy()


def test_lstm_layer_matches_torch():
    torch_lstm = torch.nn.LSTM(IN, H, num_layers=1)
    x = torch.randn(T, B, IN)
    h0 = torch.zeros(1, B, H)
    ref_out, (ref_h, ref_c) = torch_lstm(x, (h0, h0))

    p = LSTMParams(
        w_ih=jnp.asarray(_np(torch_lstm.weight_ih_l0)),
        w_hh=jnp.asarray(_np(torch_lstm.weight_hh_l0)),
        b_ih=jnp.asarray(_np(torch_lstm.bias_ih_l0)),
        b_hh=jnp.asarray(_np(torch_lstm.bias_hh_l0)),
    )
    out, hT, cT = lstm_layer(jnp.asarray(_np(x)), jnp.zeros((B, H)), jnp.zeros((B, H)), p)
    np.testing.assert_allclose(np.asarray(out), _np(ref_out), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), _np(ref_h)[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), _np(ref_c)[0], rtol=1e-5, atol=1e-5)


def test_gru_layer_matches_torch():
    torch_gru = torch.nn.GRU(IN, H, num_layers=1)
    x = torch.randn(T, B, IN)
    ref_out, ref_h = torch_gru(x, torch.zeros(1, B, H))
    p = LSTMParams(
        w_ih=jnp.asarray(_np(torch_gru.weight_ih_l0)),
        w_hh=jnp.asarray(_np(torch_gru.weight_hh_l0)),
        b_ih=jnp.asarray(_np(torch_gru.bias_ih_l0)),
        b_hh=jnp.asarray(_np(torch_gru.bias_hh_l0)),
    )
    out, hT = gru_layer(jnp.asarray(_np(x)), jnp.zeros((B, H)), p)
    np.testing.assert_allclose(np.asarray(out), _np(ref_out), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nl", ["tanh", "relu"])
def test_rnn_layer_matches_torch(nl):
    torch_rnn = torch.nn.RNN(IN, H, num_layers=1, nonlinearity=nl)
    x = torch.randn(T, B, IN)
    ref_out, _ = torch_rnn(x, torch.zeros(1, B, H))
    p = LSTMParams(
        w_ih=jnp.asarray(_np(torch_rnn.weight_ih_l0)),
        w_hh=jnp.asarray(_np(torch_rnn.weight_hh_l0)),
        b_ih=jnp.asarray(_np(torch_rnn.bias_ih_l0)),
        b_hh=jnp.asarray(_np(torch_rnn.bias_hh_l0)),
    )
    out, _ = rnn_layer(jnp.asarray(_np(x)), jnp.zeros((B, H)), p, nl)
    np.testing.assert_allclose(np.asarray(out), _np(ref_out), rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_mha():
    E, heads = 8, 2
    mha = torch.nn.MultiheadAttention(E, heads, dropout=0.0)
    x = torch.randn(T, B, E)
    mask = torch.triu(torch.ones(T, T), diagonal=1).bool()
    mask_f = torch.zeros(T, T).masked_fill(mask, float("-inf"))
    ref_out, _ = mha(x, x, x, attn_mask=mask_f)

    # replicate: q,k,v from the fused in_proj, then core attention + out_proj
    w_in = _np(mha.in_proj_weight)  # (3E, E)
    b_in = _np(mha.in_proj_bias)
    xj = jnp.asarray(_np(x))
    qkv = xj @ jnp.asarray(w_in).T + jnp.asarray(b_in)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    att = multihead_attention(q, k, v, heads, causal_mask(T))
    out = att @ jnp.asarray(_np(mha.out_proj.weight)).T + jnp.asarray(_np(mha.out_proj.bias))
    np.testing.assert_allclose(np.asarray(out), _np(ref_out), rtol=1e-4, atol=1e-5)


def test_standard_encoder_layer_matches_torch():
    """Full post-LN GELU encoder layer vs torch.nn.TransformerEncoderLayer."""
    from bayeslms_tpu.models.transformer_lm import StandardEncoderLayer

    E, heads, FF = 8, 2, 16
    tel = torch.nn.TransformerEncoderLayer(E, heads, FF, dropout=0.0, activation="gelu")
    tel.eval()
    x = torch.randn(T, B, E)
    mask = torch.zeros(T, T).masked_fill(
        torch.triu(torch.ones(T, T), diagonal=1).bool(), float("-inf")
    )
    with torch.no_grad():
        ref = tel(x, src_mask=mask)

    layer = StandardEncoderLayer(E, heads, FF, dropout=0.0)
    params = layer.init(jax.random.key(0), jnp.asarray(_np(x)), causal_mask(T))["params"]

    p = jax.tree.map(np.asarray, params)
    p["self_attn"]["qkv_net"]["kernel"] = _np(tel.self_attn.in_proj_weight).T
    p["self_attn"]["qkv_net"]["bias"] = _np(tel.self_attn.in_proj_bias)
    p["self_attn"]["o_net"]["kernel"] = _np(tel.self_attn.out_proj.weight).T
    p["self_attn"]["o_net"]["bias"] = _np(tel.self_attn.out_proj.bias)
    p["linear1"]["kernel"] = _np(tel.linear1.weight).T
    p["linear1"]["bias"] = _np(tel.linear1.bias)
    p["linear2"]["kernel"] = _np(tel.linear2.weight).T
    p["linear2"]["bias"] = _np(tel.linear2.bias)
    p["norm1"]["scale"] = _np(tel.norm1.weight)
    p["norm1"]["bias"] = _np(tel.norm1.bias)
    p["norm2"]["scale"] = _np(tel.norm2.weight)
    p["norm2"]["bias"] = _np(tel.norm2.bias)

    out = layer.apply({"params": p}, jnp.asarray(_np(x)), causal_mask(T), True)
    np.testing.assert_allclose(np.asarray(out), _np(ref), rtol=1e-4, atol=1e-5)


def test_positional_encoding_matches_reference_formula():
    """Sin/cos table vs the reference construction (model.py:93-104)."""
    import math

    d_model, max_len = 10, 50
    pe = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)

    ours = sinusoidal_positional_encoding(max_len, d_model)
    np.testing.assert_allclose(np.asarray(ours), _np(pe), rtol=1e-5, atol=1e-6)


def test_kl_closed_forms():
    """KL helpers vs straight numpy implementations of the reference forms."""
    from bayeslms_tpu.ops import gaussian

    rng = np.random.default_rng(0)
    m = rng.normal(size=(4, 5)).astype(np.float32)
    lg = rng.normal(size=(4, 5)).astype(np.float32) * 0.1 - 2.0

    ref = np.mean(m**2 - 2 * lg + np.exp(2 * lg)) / 2
    np.testing.assert_allclose(float(gaussian.kl_std_normal(m, lg)), ref, rtol=1e-6)

    ref_m1 = np.mean(m**2 - 2 * lg + np.exp(2 * lg) - 1) / 2
    np.testing.assert_allclose(float(gaussian.kl_std_normal_m1(m, lg)), ref_m1, rtol=1e-6)

    prior = rng.normal(size=(4, 5)).astype(np.float32)
    ref_p = np.sum((m - prior) ** 2 - 2 * lg + np.exp(2 * lg)) / 2
    np.testing.assert_allclose(
        float(gaussian.kl_vs_prior_sum(m, lg, prior)), ref_p, rtol=1e-6
    )

    # GPNN2 full KL with zero prior (model.py:2078-2088)
    fvar = np.exp(2 * lg)
    ref_full = np.sum((m**2) / 1.0 + fvar - 2 * (0.0 - lg) / m.shape[1] - 1) / 2
    np.testing.assert_allclose(
        float(gaussian.kl_vs_prior_full(m, lg, np.zeros_like(m), np.zeros_like(lg))),
        ref_full,
        rtol=1e-5,
    )


def test_sampling_statistics():
    """sample_gaussian moments match N(mean, exp(lgstd)^2)."""
    from bayeslms_tpu.ops import gaussian

    key = jax.random.key(0)
    mean = jnp.full((200, 200), 1.5)
    lgstd = jnp.full((200, 200), np.log(0.3))
    s = gaussian.sample_gaussian(key, mean, lgstd)
    assert abs(float(s.mean()) - 1.5) < 0.01
    assert abs(float(s.std()) - 0.3) < 0.01
