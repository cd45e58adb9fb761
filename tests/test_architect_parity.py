"""Architect update-rule parity vs a hand-computed torch reference step.

Replicates the reference architect.py semantics on a tiny analytic problem:
- virtual step = theta - eta * (clip(grads) + network_weight_decay*theta)
  (architect.py:34-42)
- second-order arch grad = dalpha_valid(unrolled) - eta*clip_coef*HVP with
  the valid grad vector clipped before the HVP (architect.py:75-97)
- arch optimizer = torch Adam(lr, weight_decay): betas (0.9, 0.999),
  L2-in-grad weight decay (architect.py:31)
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from bayeslms_tpu.nas.architect import Architect, _clip_by_total

CLIP = 0.25
WD = 5e-7
ETA = 0.4


def _loss_np(w, a, batch):
    # smooth coupled loss: valid/train batches select different targets
    t = batch
    return ((w * a[0] - t) ** 2).sum() + 0.5 * (a[1] ** 2) * (w**2).sum()


def loss_jax(params, arch, batch, rngs):
    return _loss_np(params["w"], arch, batch)


def loss_torch(w, a, batch):
    return ((w * a[0] - batch) ** 2).sum() + 0.5 * (a[1] ** 2) * (w**2).sum()


def _setup(scale=1.0):
    # scale < 1 shrinks every gradient: at scale 1e-3 the train-grad norm is
    # far below CLIP, so the reference's RAW clip coefficient is >> 1 and
    # AMPLIFIES the implicit term (architect.py:21 returns it unclamped)
    w0 = np.array([0.3, -1.2, 0.7], np.float32) * scale
    a0 = np.array([0.9, 0.2], np.float32)
    train_b = np.array([0.5, 0.1, -0.4], np.float32) * scale
    valid_b = np.array([-0.2, 0.8, 0.3], np.float32) * scale
    return w0, a0, train_b, valid_b


def _torch_virtual_step(w0, a0, train_b):
    w = torch.tensor(w0, requires_grad=True)
    a = torch.tensor(a0, requires_grad=True)
    loss = loss_torch(w, a, torch.tensor(train_b))
    (g,) = torch.autograd.grad(loss, [w])
    norm = g.norm(2)
    coef = float(CLIP / (norm + 1e-6))  # reference returns the RAW coef
    g = g * min(coef, 1.0)              # but scales only when < 1
    dtheta = g + WD * w.detach()
    return (w.detach() - ETA * dtheta).numpy(), coef


import pytest


@pytest.mark.parametrize("scale", [1.0, 1e-3])
def test_virtual_step_matches_torch(scale):
    w0, a0, train_b, _ = _setup(scale)
    arch = Architect(loss_jax, w_lr=ETA, network_weight_decay=WD,
                     network_clip=CLIP, unrolled=True)
    new_p, coef = arch.virtual_step({"w": jnp.asarray(w0)}, jnp.asarray(a0),
                                    train_b, {})
    ref_p, ref_coef = _torch_virtual_step(w0, a0, train_b)
    np.testing.assert_allclose(np.asarray(new_p["w"]), ref_p, rtol=1e-6)
    np.testing.assert_allclose(float(coef), ref_coef, rtol=1e-6)
    if scale < 1.0:
        assert ref_coef > 1.0, "small-grad case must exercise the raw coef"


@pytest.mark.parametrize("scale", [1.0, 1e-3])
def test_unrolled_arch_grad_matches_torch_recipe(scale):
    """Full second-order rule with the HVP computed by the reference's own
    finite-difference recipe in torch (r=1e-2) — our exact HVP must agree to
    within the finite-difference error. scale=1e-3 exercises the raw
    (unclamped) clip coefficient amplifying the implicit term."""
    w0, a0, train_b, valid_b = _setup(scale)

    # ---- torch reference (architect.py:75-139) ----
    new_w, clip_coef = _torch_virtual_step(w0, a0, train_b)
    wt = torch.tensor(new_w, requires_grad=True)
    at = torch.tensor(a0, requires_grad=True)
    vloss = loss_torch(wt, at, torch.tensor(valid_b))
    dalpha, dtheta = torch.autograd.grad(vloss, [at, wt])
    norm = dtheta.norm(2)
    coef_v = min(float(CLIP / (norm + 1e-6)), 1.0)  # v itself IS clipped
    vector = dtheta * coef_v

    r = 1e-2
    R = r / vector.norm()

    def train_arch_grad(w_np):
        w = torch.tensor(w_np, requires_grad=False)
        a = torch.tensor(a0, requires_grad=True)
        loss = loss_torch(w, a, torch.tensor(train_b))
        (ga,) = torch.autograd.grad(loss, [a])
        return ga

    gp = train_arch_grad(w0 + (R * vector).numpy())
    gn = train_arch_grad(w0 - (R * vector).numpy())
    implicit = (gp - gn) / (2 * R)
    ref_grad = (dalpha - ETA * clip_coef * implicit).numpy()

    # ---- ours ----
    arch = Architect(loss_jax, w_lr=ETA, network_weight_decay=WD,
                     network_clip=CLIP, unrolled=True)
    ours = arch._arch_grad({"w": jnp.asarray(w0)}, jnp.asarray(a0),
                           train_b, valid_b, {})
    np.testing.assert_allclose(np.asarray(ours), ref_grad, rtol=1e-3, atol=1e-4)


def test_arch_adam_step_matches_torch():
    """One optimizer step on the arch params == torch Adam(lr, weight_decay)."""
    _, a0, train_b, valid_b = _setup()
    LR, AWD = 3e-3, 1e-3
    w0 = np.array([0.3, -1.2, 0.7], np.float32)

    arch = Architect(loss_jax, arch_lr=LR, arch_weight_decay=AWD,
                     w_lr=ETA, network_weight_decay=WD, network_clip=CLIP,
                     unrolled=False)
    state = arch.init(jnp.asarray(a0))
    state = arch.step(state, {"w": jnp.asarray(w0)}, train_b, valid_b, {})

    at = torch.tensor(a0, requires_grad=True)
    opt = torch.optim.Adam([at], lr=LR, weight_decay=AWD)
    opt.zero_grad()
    loss = loss_torch(torch.tensor(w0), at, torch.tensor(valid_b))
    loss.backward()
    opt.step()
    np.testing.assert_allclose(np.asarray(state.arch), at.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
