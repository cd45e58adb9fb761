"""Sharded (pjit) training step.

Wraps Trainer's step with NamedShardings over a (dp, tp) mesh: params follow
the path rules in mesh.py, batches shard over dp, scalars replicate. XLA
GSPMD inserts the gradient all-reduce (dp) and the tensor-parallel
collectives (tp) over ICI — no hand-written communication, per the
annotate-and-let-XLA-partition recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..train.loop import Trainer
from ..train.optim import OptState
from .mesh import batch_sharding, hidden_sharding, params_shardings, replicated


def make_sharded_train_step(trainer: Trainer, mesh: Mesh, params, masked: bool = False):
    """``masked=True`` builds the variant taking a trailing (T, B) CE mask —
    used once per epoch for the final ragged window (train/loop.py)."""
    p_sh = params_shardings(mesh, params)
    opt_sh = OptState(momentum=p_sh)
    b_sh = batch_sharding(mesh)
    h_sh = hidden_sharding(mesh)
    rep = replicated(mesh)

    if getattr(trainer, "use_shardmap_dp", False):
        # Pure-dp mesh: the whole step runs as a shard_map body per device —
        # full single-chip fused-kernel path on the local batch shard, grads
        # pmean'ed inside (_step_impl dp_axis), identical replicated update
        # everywhere. GSPMD never sees the pallas calls.
        from jax.sharding import PartitionSpec as P

        hP = P(None, "dp", None)
        bP = P(None, "dp")

        if masked:
            def body_m(p, o, h, d, t, lr, ks, k, m):
                return trainer._step_impl(
                    p, o, h, d, t, lr, ks, k, dp_axis="dp", mask=m
                )

            body, extra = body_m, (bP,)
        else:
            def body(p, o, h, d, t, lr, ks, k):
                return trainer._step_impl(p, o, h, d, t, lr, ks, k, dp_axis="dp")

            extra = ()

        step = jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), (hP, hP), bP, bP, P(), P(), P()) + extra,
                out_specs=(P(), P(), (hP, hP), P(), P(), P(), P()),
                check_vma=False,
            ),
            donate_argnums=(0, 1),
        )
        return step, p_sh, b_sh, h_sh

    # tp>1: GSPMD partitions the step (vocab/FFN/gate shardings); the opaque
    # pallas fast paths are trace-disabled — GSPMD cannot split a Mosaic
    # call and would all-gather its operands instead (ops/kernel_gate.py).
    if masked:
        def gspmd_step(p, o, h, d, t, lr, ks, k, m):
            from ..ops.kernel_gate import no_pallas

            with no_pallas():
                return trainer._step_impl(p, o, h, d, t, lr, ks, k, mask=m)

        extra = (b_sh,)
    else:
        def gspmd_step(*args):
            from ..ops.kernel_gate import no_pallas

            with no_pallas():
                return trainer._step_impl(*args)

        extra = ()

    step = jax.jit(
        gspmd_step,
        in_shardings=(p_sh, opt_sh, (h_sh, h_sh), b_sh, b_sh, rep, rep, rep) + extra,
        # pin outputs too: without this GSPMD may emit the new hidden with a
        # propagated (…, tp) sharding that then mismatches the declared input
        # sharding when fed back on the next step
        out_shardings=(p_sh, opt_sh, (h_sh, h_sh), rep, rep, rep, rep),
        donate_argnums=(0, 1),
    )
    return step, p_sh, b_sh, h_sh


def place(tree, shardings):
    return jax.device_put(tree, shardings)
