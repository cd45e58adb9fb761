"""DARTS architect: optimizes architecture weights on the validation split.

Reference: ``Architect`` (architect.py): torch Adam over arch params with
default betas and L2-in-grad weight decay (:31); first-order mode backprops
the validation loss directly into the arch weights (:62-71); second-order
mode takes one virtual SGD step on the model weights — clipped grads plus
``network_weight_decay * theta`` (:34-42) — then combines the unrolled
validation gradient with an implicit Hessian-vector term scaled by
``eta * clip_coef`` (:75-97). The reference approximates the HVP by finite
differences (:117-139) because torch could not differentiate through its
optimizer step; here the same mixed second derivative is computed EXACTLY
with ``jax.grad`` of a gradient-vector dot product (functionally equivalent,
minus the finite-difference error).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class ArchitectState(NamedTuple):
    arch: jax.Array
    opt_state: optax.OptState


def _clip_by_total(tree, max_norm: float):
    """Reference _clip (architect.py:11-21): scaling is applied only when
    max_norm/(norm+1e-6) < 1, but the RAW coefficient is returned either way
    — and _backward_step_unrolled scales the implicit Hessian term by
    eta*clip_coef unconditionally, so a small train-grad norm AMPLIFIES the
    correction (coef >> 1). Returns (clipped_tree, raw_coef)."""
    norm = optax.global_norm(tree)
    coef = max_norm / (norm + 1e-6)
    scale = jnp.minimum(coef, 1.0)
    return jax.tree.map(lambda g: g * scale, tree), coef


class Architect:
    def __init__(
        self,
        loss_fn: Callable,  # loss_fn(params, arch, batch, rngs) -> scalar
        arch_lr: float = 3e-3,
        arch_weight_decay: float = 1e-3,
        w_lr: float = 1.0,
        network_weight_decay: float = 5e-7,
        network_clip: float = 0.25,
        unrolled: bool = False,
    ):
        self.loss_fn = loss_fn
        self.unrolled = unrolled
        self.w_lr = w_lr
        self.network_weight_decay = network_weight_decay
        self.network_clip = network_clip
        # torch.optim.Adam(arch_params, lr, weight_decay) semantics
        # (architect.py:31): default betas (0.9, 0.999), eps 1e-8, and the
        # weight decay added INTO the gradient before the Adam moments.
        self.opt = optax.chain(
            optax.add_decayed_weights(arch_weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-arch_lr),
        )
        self._step = jax.jit(self._step_impl)

    def init(self, arch: jax.Array) -> ArchitectState:
        return ArchitectState(arch=arch, opt_state=self.opt.init(arch))

    def virtual_step(self, params, arch, train_batch, rngs):
        """One virtual SGD step (architect.py:34-42): clipped train grads
        plus weight decay, applied at the network lr. Returns the stepped
        params and the clip coefficient."""
        g_w = jax.grad(lambda p: self.loss_fn(p, arch, train_batch, rngs))(params)
        g_w, clip_coef = _clip_by_total(g_w, self.network_clip)
        dtheta = jax.tree.map(
            lambda g, p: g + self.network_weight_decay * p, g_w, params
        )
        new_p = jax.tree.map(lambda p, d: p - self.w_lr * d, params, dtheta)
        return new_p, clip_coef

    def _arch_grad(self, params, arch, train_batch, valid_batch, rngs):
        if not self.unrolled:
            return jax.grad(lambda a: self.loss_fn(params, a, valid_batch, rngs))(arch)

        # --- second-order decomposition (architect.py:75-97) ---
        new_p, clip_coef = self.virtual_step(params, arch, train_batch, rngs)
        new_p = jax.lax.stop_gradient(new_p)

        # dalpha: validation grad at the unrolled weights (treated constant)
        dalpha = jax.grad(lambda a: self.loss_fn(new_p, a, valid_batch, rngs))(arch)

        # v: validation grad w.r.t. the unrolled weights, clipped like the
        # reference clips dtheta before the HVP (architect.py:88)
        v = jax.grad(lambda p: self.loss_fn(p, arch, valid_batch, rngs))(new_p)
        v, _ = _clip_by_total(v, self.network_clip)
        v = jax.lax.stop_gradient(v)

        # implicit term: d/da < grad_p train_loss(p, a), v > at the ORIGINAL
        # params — the exact value the finite-difference HVP approximates
        # (architect.py:117-139)
        def gdot(a):
            g = jax.grad(lambda p: self.loss_fn(p, a, train_batch, rngs))(params)
            return sum(
                jnp.vdot(x, y)
                for x, y in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(v))
            )

        implicit = jax.grad(gdot)(arch)
        return jax.tree.map(
            lambda d, i: d - self.w_lr * clip_coef * i, dalpha, implicit
        )

    def _step_impl(self, state: ArchitectState, params, train_batch, valid_batch, rngs):
        g = self._arch_grad(params, state.arch, train_batch, valid_batch, rngs)
        updates, opt_state = self.opt.update(g, state.opt_state, state.arch)
        arch = optax.apply_updates(state.arch, updates)
        return ArchitectState(arch=arch, opt_state=opt_state)

    def step(self, state, params, train_batch, valid_batch, rngs):
        return self._step(state, params, train_batch, valid_batch, rngs)
