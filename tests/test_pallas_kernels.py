"""Pallas attention + bayes-matmul kernels vs XLA references (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeslms_tpu.ops.attention_pallas as ap
import bayeslms_tpu.ops.bayes_matmul as bm
from bayeslms_tpu.ops.attention import causal_mask, multihead_attention


from jax.experimental.pallas import tpu as pltpu


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ap, "_INTERPRET", True)
    # bayes_matmul uses pltpu.prng_* — needs the TPU-semantics interpreter
    # (the generic one has no lowering for prng_seed). NOTE: interpreted PRNG
    # bits are degenerate, so only *consistency* between the fused matmul and
    # sample_weights is checkable here; distribution moments and seed
    # sensitivity are asserted on real TPU by tools/tpu_kernel_check.py.
    monkeypatch.setattr(bm, "_INTERPRET", pltpu.InterpretParams())


@pytest.mark.parametrize("T", [16, 24])  # 24: exercises q-padding
def test_causal_attention_matches_xla(T):
    B, E, h = 3, 32, 4
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32)) for _ in range(3))
    ref = multihead_attention(q, k, v, h, causal_mask(T))
    got = ap.causal_attention_pallas(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_bayes_matmul_consistency():
    """Fused sample+matmul equals x @ sample_weights(seed)^T — the two
    kernels must generate identical per-tile noise (the property the custom
    VJP depends on)."""
    M, N, K = 16, 256, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.1)
    lgstd = jnp.full((N, K), np.log(0.5), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)

    w_eff = bm.sample_weights(mean, lgstd, seed)
    y = bm.bayes_matmul(x, mean, lgstd, seed)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w_eff.T), rtol=1e-4, atol=1e-4)

    y2 = bm.bayes_matmul(x, mean, lgstd, seed)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_bayes_matmul_grad_matches_xla_formula():
    """Custom VJP vs autodiff through the explicit sampled-weight formula."""
    M, N, K = 8, 128, 128
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.1)
    lgstd = jnp.full((N, K), np.log(0.3), jnp.float32)
    seed = jnp.asarray([3], jnp.int32)
    w_eff = bm.sample_weights(mean, lgstd, seed)
    eps = (w_eff - mean) / jnp.exp(lgstd)

    def loss_fused(x, mean, lgstd):
        return jnp.sum(bm.bayes_matmul(x, mean, lgstd, seed) ** 2)

    def loss_explicit(x, mean, lgstd):
        w = mean + jnp.exp(lgstd) * eps
        return jnp.sum((x @ w.T) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, mean, lgstd)
    g2 = jax.grad(loss_explicit, argnums=(0, 1, 2))(x, mean, lgstd)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_fused_decode_ce_matches_xla(monkeypatch):
    """Fused decoder+CE (online logsumexp over vocab tiles) vs explicit
    logits+CE, including vocab/token padding paths."""
    import optax
    import bayeslms_tpu.ops.ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    rng = np.random.default_rng(0)
    T, B, D, V = 5, 3, 16, 200  # V pads to 256, M=15 pads to 16
    h = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.integers(0, V, size=(T, B)).astype(np.int32))

    got = cp.fused_decode_ce(h, emb, bias, tgt)
    logits = h @ emb.T + bias
    want = optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, V), tgt.reshape(-1)
    ).reshape(T, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fused_decode_ce_train_grads_match_xla(monkeypatch):
    """Custom-VJP fused decode+CE: value and grads (dh, dE, db) match the
    XLA logits+softmax-CE reference (interpret mode, non-multiple shapes)."""
    import optax
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM_TRAIN", 8)
    monkeypatch.setattr(cp, "_BV", 128)

    rng = np.random.default_rng(3)
    T, B, D, V = 5, 3, 16, 200  # M=15 pads to 16; V pads to 256
    h = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.integers(0, V, size=(T, B)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0.2, 1.0, size=(T, B)).astype(np.float32))

    def loss_fused(h, emb, bias):
        ce = cp.fused_decode_ce_train(h, emb, bias, tgt)
        return (ce * w).sum()

    def loss_xla(h, emb, bias):
        logits = h @ emb.T + bias
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, V), tgt.reshape(-1)
        ).reshape(T, B)
        return (ce * w).sum()

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(h, emb, bias)
    v2, g2 = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(h, emb, bias)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ("dh", "dE", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_sample_noise_grad(monkeypatch):
    """sample_noise custom VJP: d/dlgstd == the noise itself (TPU-semantics
    interpret mode; distribution moments are TPU-only — interpreted PRNG
    bits are degenerate — and covered by tools/tpu_kernel_check.py)."""
    from jax.experimental.pallas import tpu as pltpu
    from bayeslms_tpu.ops import bayes_matmul as bm

    monkeypatch.setattr(bm, "_INTERPRET", pltpu.InterpretParams())
    lgstd = jnp.asarray(np.full((128, 128), -0.7, np.float32))
    seed = jnp.asarray([3], jnp.int32)

    n = bm.sample_noise(lgstd, seed)
    g = jax.grad(lambda lg: jnp.sum(bm.sample_noise(lg, seed) ** 2) / 2)(lgstd)
    # d/dlgstd sum(n^2)/2 = n * dn/dlgstd = n * n
    np.testing.assert_allclose(np.asarray(g), np.asarray(n) ** 2, rtol=1e-5)


# ----------------------------------------- flash attention training VJP

@pytest.fixture
def train_attn_interpret(monkeypatch):
    import bayeslms_tpu.ops.attention_train_pallas as atp

    monkeypatch.setattr(atp, "_INTERPRET", pltpu.InterpretParams())
    return atp


@pytest.mark.parametrize("T", [16, 24])  # 24: T % block != 0 (padding)
def test_flash_attention_train_nodrop_matches_xla(train_attn_interpret, T):
    """rate=0: forward AND grads equal the XLA einsum attention."""
    atp = train_attn_interpret
    B, E, h = 2, 32, 4
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(T, B, E)), jnp.float32)
               for _ in range(3))
    w = jnp.asarray(rng.normal(size=(T, B, E)), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    def xla_loss(q, k, v):
        out = multihead_attention(q, k, v, h, attn_mask=causal_mask(T),
                                  deterministic=True)
        return (out * w).sum()

    def ker_loss(q, k, v):
        return (atp.flash_attention_train(q, k, v, h, 0.0, seed) * w).sum()

    # deterministic=True would route XLA path; ensure it does (no pallas):
    ref_v, ref_g = jax.value_and_grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    got_v, got_g = jax.value_and_grad(ker_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(got_v, ref_v, rtol=2e-5)
    for r, g, name in zip(ref_g, got_g, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_flash_attention_train_dropout_grads(train_attn_interpret):
    """rate>0: the kernel is deterministic given seed, so finite differences
    validate the custom VJP (incl. bit-identical mask regeneration across
    the three kernels)."""
    from jax.test_util import check_grads

    atp = train_attn_interpret
    T, B, E, h = 16, 2, 32, 4
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(T, B, E)), jnp.float32)
               for _ in range(3))
    seed = jnp.asarray([1234], jnp.int32)

    f = lambda q, k, v: atp.flash_attention_train(q, k, v, h, 0.25, seed)
    # same seed -> identical output; custom VJP consistent with numerics
    o1, o2 = f(q, k, v), f(q, k, v)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    check_grads(f, (q, k, v), order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


def test_flash_attention_train_via_multihead(train_attn_interpret, monkeypatch):
    """multihead_attention routes the causal non-deterministic path to the
    kernel (forced on; the auto default engages at T >= 1024) and stays
    differentiable."""
    import bayeslms_tpu.ops.attention_train_pallas as atp_mod

    monkeypatch.setenv("BAYESLM_PALLAS_ATTN_TRAIN", "1")
    # the availability gate is platform-based (False on the CPU test
    # platform); force it so the routing branch itself (seed derivation,
    # arg plumbing) actually executes under the interpreter
    monkeypatch.setattr(atp_mod, "flash_attn_train_ok",
                        lambda T, E, nh: True)
    T, B, E, h = 16, 2, 32, 4
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(T, B, E)), jnp.float32)
               for _ in range(3))

    def loss(q):
        out = multihead_attention(
            q, k, v, h, attn_mask=None, dropout_rate=0.2,
            dropout_rng=jax.random.key(0), deterministic=False, causal=True,
        )
        return (out ** 2).sum()

    val, g = jax.value_and_grad(loss)(q)
    assert np.isfinite(val) and np.isfinite(np.asarray(g)).all()


def test_explicit_mask_pins_einsum_path(train_attn_interpret, monkeypatch):
    """Masking contract: an explicit attn_mask alongside causal=True must
    bypass every Pallas route (the kernels only implement the implicit
    causal mask) and honour the given mask — here an augmented
    causal+padding mask whose effect the kernel would silently drop."""
    import bayeslms_tpu.ops.attention_train_pallas as atp_mod

    monkeypatch.setenv("BAYESLM_PALLAS_ATTN_TRAIN", "1")
    monkeypatch.setenv("BAYESLM_PALLAS_ATTN", "1")
    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise AssertionError("kernel route taken despite explicit mask")

    monkeypatch.setattr(atp_mod, "flash_attn_train_ok", boom)
    T, B, E, h = 8, 2, 16, 4
    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.normal(size=(T, B, E)), jnp.float32)
               for _ in range(3))
    # causal mask with the last key position padded out for every query
    aug = np.array(causal_mask(T), copy=True)
    aug[:, -1] = -np.inf
    out = multihead_attention(q, k, v, h, attn_mask=jnp.asarray(aug),
                              dropout_rate=0.2, dropout_rng=jax.random.key(1),
                              deterministic=False, causal=True)
    assert not calls
    # padded key contributes nothing: query T-1 under the aug mask attends
    # keys 0..T-2 — identical to unmasked attention of q[-1:] over k[:-1]
    out_det = multihead_attention(q, k, v, h, attn_mask=jnp.asarray(aug),
                                  deterministic=True, causal=True)
    ref_last = multihead_attention(q[-1:], k[:-1], v[:-1], h, attn_mask=None,
                                   deterministic=True, causal=False)
    np.testing.assert_allclose(np.asarray(out_det[-1]), np.asarray(ref_last[0]),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()
