"""Fused GP gate-6 train recurrence (ops/gp_lstm_pallas.py) vs the scan.

The kernel must reproduce the GPLSTMCell lax.scan semantics exactly —
forward AND gradients (custom VJP with in-kernel mixture recompute and
dcoef accumulation) — since docs/CONVERGENCE.md's GP twins ride on the
cell's parity with the reference (model.py:1683-1906).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeslms_tpu.ops.lstm_pallas as lp
from bayeslms_tpu.ops.gp_lstm_pallas import gp6_layer_fused


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(lp, "_INTERPRET", True)


def _scan_ref(xg, w, b, coef, h0, c0, step_mask=None):
    """Pure-jnp reference of the gate-6 step (GPLSTMCell step_fn, g=6)."""
    acts = (jax.nn.sigmoid, jnp.tanh, jax.nn.relu)

    def step(carry, inp):
        h, c = carry
        xg_t, m_t = inp
        pre = h @ w.T + b
        mix = sum(coef[i] * a(pre) for i, a in enumerate(acts))
        gates = xg_t + mix
        i_, f, g_, o = jnp.split(gates, 4, axis=-1)
        i_, f, o = jax.nn.sigmoid(i_), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g_ = jnp.tanh(g_)
        cn = f * c + i_ * g_
        hn = o * jnp.tanh(cn)
        if step_mask is not None:
            keep = m_t[:, None]
            hn = keep * hn + (1 - keep) * h
            cn = keep * cn + (1 - keep) * c
        return (hn, cn), hn

    T, B, _ = xg.shape
    ms = step_mask if step_mask is not None else jnp.ones((T, B))
    (hT, cT), ys = jax.lax.scan(step, (h0, c0), (xg, ms))
    return ys, hT, cT


def _inputs(T=6, B=4, H=8, masked=False, seed=0):
    rng = np.random.default_rng(seed)
    xg = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.1)
    coef = jnp.asarray(rng.uniform(size=(3, 4 * H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.2)
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.2)
    mask = None
    if masked:
        mask = jnp.asarray(
            (rng.uniform(size=(T, B)) > 0.3).astype(np.float32))
    return xg, w, b, coef, h0, c0, mask


@pytest.mark.parametrize("masked", [False, True])
def test_gp6_forward_matches_scan(masked):
    xg, w, b, coef, h0, c0, mask = _inputs(masked=masked)
    ys, (hT, cT) = gp6_layer_fused(xg, w, b, coef, h0, c0, step_mask=mask)
    ys_r, hT_r, cT_r = _scan_ref(xg, w, b, coef, h0, c0, step_mask=mask)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_r),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("masked", [False, True])
def test_gp6_grads_match_scan(masked):
    xg, w, b, coef, h0, c0, mask = _inputs(masked=masked)

    def loss_fused(xg, w, b, coef, h0, c0):
        ys, (hT, cT) = gp6_layer_fused(xg, w, b, coef, h0, c0,
                                       step_mask=mask)
        return (ys ** 2).sum() * 0.5 + hT.sum() + (cT ** 2).sum() * 0.25

    def loss_ref(xg, w, b, coef, h0, c0):
        ys, hT, cT = _scan_ref(xg, w, b, coef, h0, c0, step_mask=mask)
        return (ys ** 2).sum() * 0.5 + hT.sum() + (cT ** 2).sum() * 0.25

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        xg, w, b, coef, h0, c0)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        xg, w, b, coef, h0, c0)
    for a, r, name in zip(gf, gr, ("xg", "w", "b", "coef", "h0", "c0")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=5e-5, atol=1e-5,
            err_msg=f"grad mismatch: {name}")


def test_gp6_cell_routes_through_kernel(monkeypatch):
    """GPLSTMCell (gate 6, type 3) produces identical outputs and grads
    with the fused kernel forced on vs the scan fallback."""
    from bayeslms_tpu import ModelConfig
    from bayeslms_tpu.models.lstm_lm import GPLSTMCore, init_hidden
    import bayeslms_tpu.ops.gp_lstm_pallas as gp

    cfg = ModelConfig(model="LSTM", vocab_size=64, emsize=8, nhid=8,
                      dropout=0.0, uncertainty="Gaussian", l_gauss_pos="63")
    core = GPLSTMCore(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 4, 8)).astype(np.float32))
    hidden = init_hidden(cfg.nlayers, 4, cfg.nhid)
    params = core.init(jax.random.key(0), x, hidden)["params"]

    outs = {}
    for on in (True, False):
        if on:
            monkeypatch.setattr(gp, "gp6_pallas_ok", lambda *a: True)
            monkeypatch.delenv("BAYESLM_PALLAS_GPLSTM", raising=False)
        else:
            monkeypatch.setenv("BAYESLM_PALLAS_GPLSTM", "0")

        def loss(p):
            (out, _), _ = core.apply(
                {"params": p}, x, hidden, False, mutable=["losses"],
                rngs={"dropout": jax.random.key(1)},
            )
            return (out.astype(jnp.float32) ** 2).mean()

        outs[on] = (loss(params), jax.grad(loss)(params))

    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        outs[True][1], outs[False][1],
    )



@pytest.mark.parametrize("gate", [1, 2, 3, 4])
def test_gpg_cell_kernel_matches_scan(gate, monkeypatch):
    """Gate-replacement kernel (gates 1-4, incl. gate 2's single-act
    mixture) vs the scan fallback: identical outputs and grads at the
    cell level (config 'g3' = gate g, gpnn type 3 — the twin config
    family, docs/CONVERGENCE.md lstm_gp)."""
    from bayeslms_tpu import ModelConfig
    from bayeslms_tpu.models.lstm_lm import GPLSTMCore, init_hidden
    import bayeslms_tpu.ops.gp_lstm_pallas as gp

    cfg = ModelConfig(model="LSTM", vocab_size=64, emsize=8, nhid=8,
                      dropout=0.0, uncertainty="Gaussian",
                      l_gauss_pos=f"{gate}3")
    core = GPLSTMCore(cfg)
    rng = np.random.default_rng(gate)
    x = jnp.asarray(rng.normal(size=(6, 4, 8)).astype(np.float32))
    hidden = init_hidden(cfg.nlayers, 4, cfg.nhid)
    params = core.init(jax.random.key(0), x, hidden)["params"]

    outs = {}
    for on in (True, False):
        if on:
            monkeypatch.setattr(gp, "gpg_pallas_ok", lambda *a: True)
            monkeypatch.delenv("BAYESLM_PALLAS_GPLSTM", raising=False)
        else:
            monkeypatch.setenv("BAYESLM_PALLAS_GPLSTM", "0")

        def loss(p):
            (out, _), _ = core.apply(
                {"params": p}, x, hidden, False, mutable=["losses"],
                rngs={"dropout": jax.random.key(1)},
            )
            return (out.astype(jnp.float32) ** 2).mean()

        outs[on] = (loss(params), jax.grad(loss)(params))

    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        outs[True][1], outs[False][1],
    )

if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_gp7_cell_routes_through_standard_kernel(monkeypatch):
    """Gate 7 (GPNN replaces the input projection, fully hoisted): the
    recurrence is the standard step and routes through the standard fused
    train kernel — outputs/grads identical to the scan fallback."""
    from bayeslms_tpu import ModelConfig
    from bayeslms_tpu.models.lstm_lm import GPLSTMCore, init_hidden
    import bayeslms_tpu.ops.lstm_pallas as lpk

    cfg = ModelConfig(model="LSTM", vocab_size=64, emsize=8, nhid=8,
                      dropout=0.0, uncertainty="Gaussian", l_gauss_pos="73")
    core = GPLSTMCore(cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(6, 4, 8)).astype(np.float32))
    hidden = init_hidden(cfg.nlayers, 4, cfg.nhid)
    params = core.init(jax.random.key(0), x, hidden)["params"]

    outs = {}
    for on in (True, False):
        if on:
            monkeypatch.setattr(lpk, "pallas_lstm_ok", lambda *a, **k: True)
            monkeypatch.delenv("BAYESLM_PALLAS_GPLSTM", raising=False)
        else:
            monkeypatch.setenv("BAYESLM_PALLAS_GPLSTM", "0")

        def loss(p):
            (out, _), _ = core.apply(
                {"params": p}, x, hidden, False, mutable=["losses"],
                rngs={"dropout": jax.random.key(1)},
            )
            return (out.astype(jnp.float32) ** 2).mean()

        outs[on] = (loss(params), jax.grad(loss)(params))

    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        outs[True][1], outs[False][1],
    )
