"""Initializers matching the reference's torch defaults.

torch ``nn.Linear`` default init is kaiming_uniform(a=sqrt(5)), which reduces
to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both weight and bias; embeddings
and decoders use U(-0.1, 0.1) (model.py:55-59); qkv projections use
xavier-uniform with zero bias (model.py:863-869).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear_weight(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_bias(fan_in: int):
    return torch_linear_weight(fan_in)


def uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_uniform():
    return jax.nn.initializers.glorot_uniform()


def zeros():
    return jax.nn.initializers.zeros
