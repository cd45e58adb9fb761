"""Model construction dispatch (reference train.py:193-224)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.lstm_lm import RecurrentLM, init_hidden
from ..models.transformer_lm import TransformerLM
from .config import ModelConfig


def build_model(cfg: ModelConfig):
    cfg.validate()
    if cfg.is_transformer:
        return TransformerLM(cfg)
    return RecurrentLM(cfg)


def init_params(model, cfg: ModelConfig, seed: int = 0, seq_len: int = 8, batch: int = 2):
    """Initialize a parameter pytree with dummy shapes."""
    rngs = {
        "params": jax.random.key(seed),
        "dropout": jax.random.key(seed + 1),
        "sample": jax.random.key(seed + 2),
    }
    tokens = jnp.zeros((seq_len, batch), dtype=jnp.int32)
    if cfg.is_transformer:
        variables = model.init(rngs, tokens, deterministic=True)
    else:
        hidden = init_hidden(cfg.nlayers, batch, cfg.nhid)
        variables = model.init(rngs, tokens, hidden, deterministic=True)
    return variables["params"]


def sum_losses(losses) -> jax.Array:
    """Sum every sown KL term in a `losses` collection."""
    total = jnp.asarray(0.0)
    for leaf in jax.tree_util.tree_leaves(losses):
        total = total + jnp.sum(leaf)
    return total
