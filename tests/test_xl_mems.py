"""Transformer-XL-style segment memory: attending over [mem; x] with the
position offset equals the tail of a full-context forward pass EXACTLY
(positions continue from the real memory length), empty memory equals the
plain path, and left-padded memories (bucketed mem lengths) stay exact."""

import numpy as np
import jax.numpy as jnp

from bayeslms_tpu import ModelConfig, build_model, init_params

V = 30


def _setup():
    cfg = ModelConfig(model="Transformer", vocab_size=V, emsize=8, nhid=16,
                      nlayers=2, nhead=2, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    rng = np.random.default_rng(0)
    full = jnp.asarray(rng.integers(0, V, size=(12, 3)).astype(np.int32))
    return model, params, full


def test_mems_equal_full_context_suffix():
    model, params, full = _setup()
    seg1, seg2 = full[:7], full[7:]

    logits_full = model.apply({"params": params}, full, deterministic=True)

    # pass 1: first segment, collecting memories
    logits1, mems = model.apply({"params": params}, seg1, deterministic=True,
                                return_mems=True)
    assert len(mems) == 2 and mems[0].shape == (7, 3, 8)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits_full[:7]),
                               rtol=1e-5, atol=1e-6)

    # pass 2: second segment attending over the memories — EXACTLY the
    # suffix of the full-context pass (positions offset by len(seg1))
    logits2 = model.apply({"params": params}, seg2, deterministic=True,
                          mems=mems)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits_full[7:]),
                               rtol=1e-4, atol=1e-5)


def test_right_padded_mems_equal_unpadded():
    """Memories right-padded to a bucket length with mem_len give the same
    logits as exact-length memories (padding is masked out of attention and
    excluded from the position offset)."""
    model, params, full = _setup()
    seg1, seg2 = full[:7], full[7:]
    _, mems = model.apply({"params": params}, seg1, deterministic=True,
                          return_mems=True)
    exact = model.apply({"params": params}, seg2, deterministic=True, mems=mems)

    PAD = 5
    padded = [jnp.concatenate([m, jnp.full((PAD,) + m.shape[1:], 7.0, m.dtype)], 0)
              for m in mems]
    got = model.apply({"params": params}, seg2, deterministic=True,
                      mems=padded, mem_len=7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact),
                               rtol=1e-5, atol=1e-6)


def test_empty_mems_equal_plain():
    model, params, full = _setup()
    seg2 = full[7:]
    logits_nomem = model.apply({"params": params}, seg2, deterministic=True)
    empty = [jnp.zeros((0, 3, 8)) for _ in range(2)]
    logits_empty = model.apply({"params": params}, seg2, deterministic=True,
                               mems=empty)
    np.testing.assert_allclose(
        np.asarray(logits_empty), np.asarray(logits_nomem), rtol=1e-5, atol=1e-6
    )
