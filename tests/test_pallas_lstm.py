"""Fused Pallas LSTM kernel vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeslms_tpu.ops.lstm_pallas as lp
from bayeslms_tpu.ops.lstm import LSTMParams, lstm_layer


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(lp, "_INTERPRET", True)


@pytest.mark.parametrize("masked", [False, True])
def test_pallas_matches_scan(masked):
    T, B, IN, H = 6, 8, 16, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, IN)).astype(np.float32))
    p = LSTMParams(
        w_ih=jnp.asarray(rng.normal(size=(4 * H, IN)).astype(np.float32) * 0.1),
        w_hh=jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * 0.1),
        b_ih=jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.1),
        b_hh=jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.1),
    )
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    if masked:
        mask = np.ones((T, B), np.float32)
        mask[3:, : B // 2] = 0.0  # half the streams end at t=3
        mask = jnp.asarray(mask)
    else:
        mask = None

    ys_ref, hT_ref, cT_ref = lstm_layer(x, h0, c0, p, step_mask=mask)
    ys, hT, cT = lp.lstm_layer_pallas(x, h0, c0, p.w_ih, p.w_hh, p.b_ih, p.b_hh, mask)

    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_ref), rtol=1e-5, atol=1e-5)
