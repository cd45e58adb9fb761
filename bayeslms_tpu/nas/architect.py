"""DARTS architect: optimizes architecture weights on the validation split.

Reference: ``Architect`` (architect.py): Adam over arch params (:32);
first-order mode backprops the validation loss directly into the arch
weights (:62-71); second-order mode differentiates the validation loss
through one virtual SGD step on the model weights (:73-134). The reference
approximates the second-order term with a finite-difference Hessian-vector
product because torch could not differentiate through its optimizer step —
in JAX the unrolled update is differentiated EXACTLY with jax.grad
(functionally equivalent, minus the finite-difference error).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class ArchitectState(NamedTuple):
    arch: jax.Array
    opt_state: optax.OptState


class Architect:
    def __init__(
        self,
        loss_fn: Callable,  # loss_fn(params, arch, batch, rngs) -> scalar
        arch_lr: float = 3e-4,
        arch_weight_decay: float = 1e-3,
        w_lr: float = 1.0,
        w_momentum: float = 0.9,
        unrolled: bool = False,
    ):
        self.loss_fn = loss_fn
        self.unrolled = unrolled
        self.w_lr = w_lr
        self.w_momentum = w_momentum
        # Adam(0.5, 0.999) + weight decay, matching architect.py:32
        self.opt = optax.chain(
            optax.add_decayed_weights(arch_weight_decay),
            optax.scale_by_adam(b1=0.5, b2=0.999),
            optax.scale(-arch_lr),
        )
        self._step = jax.jit(self._step_impl)

    def init(self, arch: jax.Array) -> ArchitectState:
        return ArchitectState(arch=arch, opt_state=self.opt.init(arch))

    def _arch_grad(self, params, arch, train_batch, valid_batch, rngs):
        if not self.unrolled:
            return jax.grad(lambda a: self.loss_fn(params, a, valid_batch, rngs))(arch)

        def valid_after_virtual_step(a):
            # one virtual SGD(momentum-free) step on the weights, then the
            # validation loss; grad flows through the update (architect.py:73-101)
            g_w = jax.grad(lambda p: self.loss_fn(p, a, train_batch, rngs))(params)
            new_p = jax.tree.map(lambda p, g: p - self.w_lr * g, params, g_w)
            return self.loss_fn(new_p, a, valid_batch, rngs)

        return jax.grad(valid_after_virtual_step)(arch)

    def _step_impl(self, state: ArchitectState, params, train_batch, valid_batch, rngs):
        g = self._arch_grad(params, state.arch, train_batch, valid_batch, rngs)
        updates, opt_state = self.opt.update(g, state.opt_state, state.arch)
        arch = optax.apply_updates(state.arch, updates)
        return ArchitectState(arch=arch, opt_state=opt_state)

    def step(self, state, params, train_batch, valid_batch, rngs):
        return self._step(state, params, train_batch, valid_batch, rngs)
