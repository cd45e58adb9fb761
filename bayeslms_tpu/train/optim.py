"""SGD + momentum with global-norm clipping.

Reference: ``optim.SGD(lr, momentum=0.9)`` with
``clip_grad_norm_(parameters, clip)`` applied before the step
(train.py:418-420, :466). On every LR-halving plateau the reference builds a
FRESH optimizer (train.py:503-505), i.e. momentum buffers reset — modeled
here by re-initializing the optimizer state.

The learning rate is injected as a step argument (not baked into the
transform) so LR halving never triggers re-compilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class OptState(NamedTuple):
    momentum: optax.Updates


def init_opt_state(params) -> OptState:
    return OptState(momentum=jax.tree.map(jnp.zeros_like, params))


def sgd_momentum_step(params, grads, opt_state: OptState, lr, clip: float, momentum: float = 0.9,
                      weight_decay: float = 0.0, gnorm=None):
    """clip(global_norm) -> buf = m*buf + g -> p -= lr*buf (torch semantics).

    ``weight_decay`` is applied AFTER clipping, inside the optimizer step,
    exactly like torch.optim.SGD(weight_decay=...) after clip_grad_norm_
    (the NAS search loop uses 1e-5, train_search_bayes.py:387-388; train.py
    uses 0).

    ``gnorm``: precomputed global norm — the tensor-parallel shard_map step
    passes a collectively-reduced norm (vocab-shard leaves live on distinct
    devices, so the local optax.global_norm would be wrong there)."""
    if gnorm is None:
        gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
    grads = jax.tree.map(lambda g: g * scale, grads)
    if weight_decay:
        grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
    new_buf = jax.tree.map(lambda b, g: momentum * b + g, opt_state.momentum, grads)
    new_params = jax.tree.map(lambda p, b: p - lr * b, params, new_buf)
    return new_params, OptState(momentum=new_buf), gnorm
