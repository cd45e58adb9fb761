"""Stochastic layer library: Bayesian dense, GP activation units, VNN noise.

Flax re-designs of the reference layer zoo (cited per class). Sampling is
driven by an explicit ``sample`` PRNG stream (``self.make_rng('sample')``)
instead of the reference's implicit ``self.training`` gating, so "one fresh
weight sample per optimizer step" is reproducible and jit-friendly. KL terms
are sown into the ``losses`` collection by the containers.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import gaussian
from . import initializers as tinit


ACTS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    # exact (erf) GELU — torch nn.GELU / F.gelu parity
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "sin": jnp.sin,
    "cos": jnp.cos,
}


class BayesDense(nn.Module):
    """Gaussian-reparameterized linear layer.

    Reference: ``BayesLinear`` (model.py:1049-1134). Weight posterior is
    N(weight_mean, exp(weight_lgstd)^2); a fresh sample is drawn per call
    during training, the mean is used at eval (model.py:1083-1096). Default
    has NO bias (matching BayesLinear(bias=False) at its two call sites:
    FFN linear2, model.py:1151; MHA o_net, model.py:952).
    """

    in_features: int
    out_features: int
    use_bias: bool = False
    # Fused Pallas sample-and-matmul (ops/bayes_matmul.py): the perturbed
    # weight never materializes in HBM. None = auto; True/False force. The
    # fused path draws its noise from the on-core PRNG (same distribution
    # as the XLA path, different bits).
    #
    # Auto resolves to the XLA path: sampling only runs under training
    # (eval scores at the posterior mean), and there the custom-VJP kernel
    # LOSES to XLA — measured on the flagship Bayes-FFN TM train step
    # (512/4096x6, V=49k, B=32): fused 17.1 ms vs XLA 14.9 ms = baseline
    # parity (tools/bayes_overhead_profile.py, r4). XLA fuses the
    # eps*exp(lgstd) add into the matmul epilogue and its bwd; the (out,in)
    # temp it materializes is noise next to the FFN matmuls. The kernel
    # remains available (use_fused=True) for forward-only MC inference
    # experiments.
    use_fused: Optional[bool] = None

    def setup(self):
        stdv = 1.0 / math.sqrt(self.out_features + 1)
        self.weight_mean = self.param(
            "weight_mean", tinit.uniform(stdv), (self.out_features, self.in_features)
        )
        self.weight_lgstd = self.param(
            "weight_lgstd", gaussian.lgstd_init(stdv), (self.out_features, self.in_features)
        )
        if self.use_bias:
            bound = 1.0 / math.sqrt(self.in_features)
            self.bias_mean = self.param("bias_mean", tinit.uniform(bound), (self.out_features,))
            self.bias_lgstd = self.param("bias_lgstd", tinit.uniform(bound), (self.out_features,))

    def _fused_ok(self, x) -> bool:
        if not self.use_fused:  # None (auto) or False -> XLA path (see above)
            return False
        from ..ops.bayes_matmul import bayes_matmul_ok
        from ..ops.kernel_gate import pallas_allowed

        if not pallas_allowed():
            return False

        M = 1
        for d in x.shape[:-1]:
            M *= d
        return bayes_matmul_ok(M, self.out_features, self.in_features)

    def __call__(self, x, deterministic: bool = True):
        if not deterministic and self._fused_ok(x):
            from ..ops.bayes_matmul import bayes_matmul

            seed = jax.random.randint(
                self.make_rng("sample"), (1,), 0, 2**31 - 1, dtype=jnp.int32
            )
            lead = x.shape[:-1]
            y = bayes_matmul(
                x.reshape(-1, self.in_features), self.weight_mean, self.weight_lgstd,
                seed,
            ).reshape(*lead, self.out_features)
        else:
            w = self.weight_mean
            if not deterministic:
                w = w + gaussian.sample_diff(self.make_rng("sample"), self.weight_lgstd)
            y = x @ w.T.astype(x.dtype)
        if self.use_bias:
            b = self.bias_mean
            if not deterministic:
                b = b + gaussian.sample_diff(self.make_rng("sample"), self.bias_lgstd)
            y = y + b.astype(x.dtype)
        return y

    def kl(self, prior_mean: Optional[jax.Array] = None):
        """Closed-form KL (model.py:1110-1123): mean-reduced, no -1 term.

        With a prior mean — explicit or via the "priors" collection (the
        TrainConfig.prior_kl switch) — the prior branch (model.py:1120-1122)
        applies: mean-reduced weight-only KL vs the prior means."""
        if prior_mean is None and self.has_variable("priors", "weight_mean"):
            prior_mean = self.get_variable("priors", "weight_mean")
        if prior_mean is None:
            kl = gaussian.kl_std_normal(self.weight_mean, self.weight_lgstd)
            if self.use_bias:
                kl = kl + gaussian.kl_std_normal(self.bias_mean, self.bias_lgstd)
            return kl
        return jnp.mean(
            (self.weight_mean - prior_mean) ** 2.0
            - self.weight_lgstd * 2.0
            + jnp.exp(self.weight_lgstd * 2.0)
        ) / 2.0


class GPNN(nn.Module):
    """GP activation unit: y = sum_i coef_i * act_i(W x + b).

    Reference: ``GPNN`` (model.py:1780-1906). ``gpnn_type`` selects which of
    {weights, coefs} are Bayesian: 0 det/det, 1 Bayes-coef, 2 Bayes-weight,
    3 both. Samples are drawn once per *call site* (sample_parameters,
    model.py:1855-1861) and only take effect when ``sample_enabled`` — the
    reference ships with ``self.sample = False`` so plain training is
    deterministic-with-KL; the NAS loop flips it on.
    """

    input_size: int
    output_size: int
    act_set: Sequence[str] = ("sigmoid", "tanh", "relu")
    gpnn_type: int = 0
    sample_enabled: bool = False

    def setup(self):
        stdv = 1.0 / math.sqrt(self.output_size)
        self.weights_mean = self.param(
            "weights_mean", tinit.uniform(stdv), (self.output_size, self.input_size)
        )
        self.bias_mean = self.param("bias_mean", tinit.zeros(), (self.output_size,))
        self.coef_mean = self.param(
            "coef_mean",
            lambda k, s: jax.random.uniform(k, s, minval=0.0, maxval=1.0),
            (len(self.act_set), self.output_size),
        )
        if self.gpnn_type in (1, 3):
            self.coef_lgstd = self.param(
                "coef_lgstd", gaussian.lgstd_init(stdv), (len(self.act_set), self.output_size)
            )
        if self.gpnn_type in (2, 3):
            self.weights_lgstd = self.param(
                "weights_lgstd", gaussian.lgstd_init(stdv), (self.output_size, self.input_size)
            )
            self.bias_lgstd = self.param(
                "bias_lgstd", gaussian.lgstd_init(stdv), (self.output_size,)
            )

    def draw(self, deterministic: bool = True):
        """Sample effective (weights, bias, coef) once — the sample is then
        reused across every timestep of a sequence (cf. GPLSTMCell.forward
        calling sample_parameters once before its time loop,
        model.py:1722-1724)."""
        w, b, coef = self.weights_mean, self.bias_mean, self.coef_mean
        if not deterministic and self.sample_enabled:
            if self.gpnn_type in (1, 3):
                coef = coef + gaussian.sample_diff(self.make_rng("sample"), self.coef_lgstd)
            if self.gpnn_type in (2, 3):
                w = w + gaussian.sample_diff(self.make_rng("sample"), self.weights_lgstd)
                b = b + gaussian.sample_diff(self.make_rng("sample"), self.bias_lgstd)
        return w, b, coef

    @staticmethod
    def apply_drawn(x, w, b, coef, act_set: Sequence[str]):
        out = x @ w.T.astype(x.dtype) + b.astype(x.dtype)
        acc = None
        for i, act in enumerate(act_set):
            term = ACTS[act](out) * coef[i].astype(x.dtype)
            acc = term if acc is None else acc + term
        return acc

    def __call__(self, x, hx=None, deterministic: bool = True, drawn=None):
        if hx is not None:
            x = jnp.concatenate([x, hx], axis=-1)
        w, b, coef = drawn if drawn is not None else self.draw(deterministic)
        return self.apply_drawn(x, w, b, coef, self.act_set)

    def kl(self):
        """model.py:1816-1826 — mean-reduced, WITH the -1 term."""
        kl = jnp.asarray(0.0)
        if self.gpnn_type in (1, 3):
            kl = kl + gaussian.kl_std_normal_m1(self.coef_mean, self.coef_lgstd)
        if self.gpnn_type in (2, 3):
            kl = kl + gaussian.kl_std_normal_m1(self.weights_mean, self.weights_lgstd)
            kl = kl + gaussian.kl_std_normal_m1(self.bias_mean, self.bias_lgstd)
        return kl


class GPNN2(nn.Module):
    """Random-feature GP unit ("first version").

    Reference: ``GPNN2`` (model.py:2036-2102): sampled frequency matrix
    (always resampled during training, no gate flag), sum of activations
    (+ skip connection), linear read-out scaled by 1/sqrt(n_MC_terms).
    """

    input_dim: int
    output_dim: int
    n_mc_terms: int = 150
    act_set: Sequence[str] = ("sigmoid", "tanh", "relu", "gelu")
    skip_act: bool = True
    deterministic_unit: bool = False

    def setup(self):
        stdv = 1.0 / math.sqrt(self.n_mc_terms)
        self.frequency_mean = self.param(
            "frequency_mean", tinit.uniform(stdv), (self.input_dim, self.n_mc_terms)
        )
        self.frequency_lgstd = self.param(
            "frequency_lgstd", gaussian.lgstd_init(stdv), (self.input_dim, self.n_mc_terms)
        )
        # Plain arrays (not an nn.Dense) so `apply_drawn` stays a pure
        # function usable inside lax.scan bodies (GP-LSTM per-step path).
        self.coef_kernel = self.param(
            "coef_kernel",
            tinit.torch_linear_weight(self.n_mc_terms),
            (self.n_mc_terms, self.output_dim),
        )
        self.coef_bias = self.param(
            "coef_bias", tinit.torch_linear_bias(self.n_mc_terms), (self.output_dim,)
        )

    def draw(self, deterministic: bool = True):
        freq = self.frequency_mean
        if not deterministic and not self.deterministic_unit:
            freq = freq + gaussian.sample_diff(self.make_rng("sample"), self.frequency_lgstd)
        return freq

    def apply_drawn(self, x, freq, coef_kernel=None, coef_bias=None):
        out = x @ freq.astype(x.dtype)
        acc = out if self.skip_act else None
        for act in self.act_set:
            term = ACTS[act](out)
            acc = term if acc is None else acc + term
        ck = self.coef_kernel if coef_kernel is None else coef_kernel
        cb = self.coef_bias if coef_bias is None else coef_bias
        acc = acc / math.sqrt(self.n_mc_terms)
        return acc @ ck.astype(x.dtype) + cb.astype(x.dtype)

    def __call__(self, x, deterministic: bool = True, drawn=None):
        freq = drawn if drawn is not None else self.draw(deterministic)
        return self.apply_drawn(x, freq)

    def kl(self, prior_mean=None, prior_lgstd=None):
        """Prior-updating KL (model.py:2078-2096); zero-prior by default."""
        pm = jnp.zeros_like(self.frequency_mean) if prior_mean is None else prior_mean
        pl = jnp.zeros_like(self.frequency_lgstd) if prior_lgstd is None else prior_lgstd
        return gaussian.kl_vs_prior_full(self.frequency_mean, self.frequency_lgstd, pm, pl)


class VNN(nn.Module):
    """Variational hidden-state noise unit.

    Reference: ``VNN`` (model.py:2534-2579): during training adds
    eps * exp(hidden_lgstd) with eps ~ N(0, 0.1) to the hidden vector. Its KL
    (model.py:2544-2549) uses the *forward activations* as "mean" and — a
    reference quirk kept for loss parity — exponentiates the activations
    rather than the lgstd in the variance term.
    """

    input_size: int

    def setup(self):
        stdv = 1.0 / math.sqrt(self.input_size)
        self.hidden_lgstd = self.param(
            "hidden_lgstd", gaussian.lgstd_init(stdv), (1, self.input_size)
        )

    def noise(self, key, n_steps: int):
        """Pre-draw per-timestep noise (n_steps, 1, H): the reference draws a
        fresh (1, H) eps at every timestep of its python loop."""
        eps = 0.1 * jax.random.normal(key, (n_steps, 1, self.input_size))
        return eps * jnp.exp(self.hidden_lgstd)[None]

    def kl(self, hidden_mean):
        """mean(h^2 - 2*lgstd + exp(2*h) - 1)/2 with h = last-step hidden."""
        return (
            jnp.mean(
                hidden_mean**2.0
                - self.hidden_lgstd * 2.0
                + jnp.exp(hidden_mean * 2.0)
                - 1.0
            )
            / 2.0
        )


class GPNNNode(nn.Module):
    """Node-level GP unit: per-activation weight blocks.

    Reference: ``GPNNNode`` (model.py:1909-2033) — like GPNN but each
    activation i gets its own (output_size, input_size) weight block
    (weights stacked to (act_num*output, input)); act_i is applied to its own
    block's output. Not used by the shipped containers (kept for capability
    parity with the layer library).
    """

    input_size: int
    output_size: int
    act_set: Sequence[str] = ("sigmoid", "tanh", "relu")
    gpnn_type: int = 0

    def setup(self):
        n_act = len(self.act_set)
        stdv = 1.0 / math.sqrt(n_act * self.output_size)
        stda = 1.0 / math.sqrt(n_act)
        self.weights_mean = self.param(
            "weights_mean", tinit.uniform(stdv), (n_act * self.output_size, self.input_size)
        )
        self.bias_mean = self.param("bias_mean", tinit.zeros(), (n_act * self.output_size,))
        self.coef_mean = self.param(
            "coef_mean",
            lambda k, s: jax.random.uniform(k, s, minval=0.0, maxval=1.0),
            (n_act, self.output_size),
        )
        if self.gpnn_type in (1, 3):
            self.coef_lgstd = self.param(
                "coef_lgstd", gaussian.lgstd_init(stda), (n_act, self.output_size)
            )
        if self.gpnn_type in (2, 3):
            self.weights_lgstd = self.param(
                "weights_lgstd", gaussian.lgstd_init(stdv),
                (n_act * self.output_size, self.input_size),
            )
            self.bias_lgstd = self.param(
                "bias_lgstd", gaussian.lgstd_init(stdv), (n_act * self.output_size,)
            )

    def __call__(self, x, hx=None, deterministic: bool = True):
        if hx is not None:
            x = jnp.concatenate([x, hx], axis=-1)
        w, b, coef = self.weights_mean, self.bias_mean, self.coef_mean
        if not deterministic:  # GPNNNode samples whenever training (model.py:2023-2030)
            if self.gpnn_type in (1, 3):
                coef = coef + gaussian.sample_diff(self.make_rng("sample"), self.coef_lgstd)
            if self.gpnn_type in (2, 3):
                w = w + gaussian.sample_diff(self.make_rng("sample"), self.weights_lgstd)
                b = b + gaussian.sample_diff(self.make_rng("sample"), self.bias_lgstd)
        out = x @ w.T.astype(x.dtype) + b.astype(x.dtype)
        O = self.output_size
        acc = None
        for i, act in enumerate(self.act_set):
            term = ACTS[act](out[..., i * O : (i + 1) * O]) * coef[i].astype(x.dtype)
            acc = term if acc is None else acc + term
        return acc

    def kl(self):
        """model.py:1980-1991 — same -1 closed form as GPNN."""
        kl = jnp.asarray(0.0)
        if self.gpnn_type in (1, 3):
            kl = kl + gaussian.kl_std_normal_m1(self.coef_mean, self.coef_lgstd)
        if self.gpnn_type in (2, 3):
            kl = kl + gaussian.kl_std_normal_m1(self.weights_mean, self.weights_lgstd)
            kl = kl + gaussian.kl_std_normal_m1(self.bias_mean, self.bias_lgstd)
        return kl
