"""Gaussian reparameterization + closed-form KL terms.

These reproduce the reference closed forms *including* their reduction quirks
so losses are numerically comparable:

- ``kl_std_normal`` (mean-reduced, no ``-1`` term): BayesLSTM/Bayes2LSTM
  (model.py:515-519, :769-773), BayesLinear (model.py:1115), EMB projection
  (model.py:1250-1256).
- ``kl_std_normal_m1`` (mean-reduced, with ``-1``): GPNN (model.py:1818-1826),
  VNN (model.py:2545-2549).
- ``kl_vs_prior_sum`` (sum-reduced, vs a prior mean): BayesLSTM prior branch
  (model.py:520-528).

All take log-std ("lgstd") parameters; std = exp(lgstd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gaussian(key, mean, lgstd, scale: float = 1.0):
    """mean + scale * eps * exp(lgstd), eps ~ N(0, 1).

    ``scale`` covers the VNN variant that draws eps ~ N(0, 0.1)
    (model.py:2559).
    """
    eps = jax.random.normal(key, jnp.shape(mean), dtype=jnp.result_type(mean))
    return mean + scale * eps * jnp.exp(lgstd)


def sample_diff(key, lgstd, scale: float = 1.0):
    """scale * eps * exp(lgstd) — the additive perturbation alone."""
    eps = jax.random.normal(key, jnp.shape(lgstd), dtype=jnp.result_type(lgstd))
    return scale * eps * jnp.exp(lgstd)


def kl_std_normal(mean, lgstd):
    """mean(mean^2 - 2*lgstd + exp(2*lgstd)) / 2 — reference form w/o -1."""
    return jnp.mean(mean**2.0 - lgstd * 2.0 + jnp.exp(lgstd * 2.0)) / 2.0


def kl_std_normal_m1(mean, lgstd):
    """mean(mean^2 - 2*lgstd + exp(2*lgstd) - 1) / 2 — true KL vs N(0,1)."""
    return jnp.mean(mean**2.0 - lgstd * 2.0 + jnp.exp(lgstd * 2.0) - 1.0) / 2.0


def kl_vs_prior_sum(mean, lgstd, prior_mean):
    """sum((mean-prior)^2 - 2*lgstd + exp(2*lgstd)) / 2 (model.py:528)."""
    return jnp.sum((mean - prior_mean) ** 2.0 - lgstd * 2.0 + jnp.exp(lgstd * 2.0)) / 2.0


def kl_vs_prior_full(mean, lgstd, prior_mean, prior_lgstd):
    """Full Gaussian-vs-Gaussian KL, sum-reduced (GPNN2, model.py:2078-2088).

    Reproduces the reference's scaling quirk: the log-variance-ratio term is
    divided by the trailing dimension of ``mean``.
    """
    var = jnp.exp(2.0 * lgstd)
    pvar = jnp.exp(2.0 * prior_lgstd)
    mean_sq = (mean - prior_mean) ** 2.0 / pvar
    std_sq = var / pvar
    log_std_sq = 2.0 * (prior_lgstd - lgstd) / mean.shape[-1]
    return jnp.sum(mean_sq + std_sq - log_std_sq - 1.0) / 2.0


def lgstd_init(stdv: float):
    """Uniform(2*log(stdv), log(stdv)) initializer used for all lgstd params
    (model.py:429-437, :1075, :1846-1852)."""
    import math

    lo, hi = 2.0 * math.log(stdv), math.log(stdv)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=lo, maxval=hi)

    return init


def uniform_init(stdv: float):
    """Uniform(-stdv, stdv) initializer (reference reset_parameters)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-stdv, maxval=stdv)

    return init
