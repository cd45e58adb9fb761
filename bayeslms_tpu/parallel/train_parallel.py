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


def make_sharded_train_step(trainer: Trainer, mesh: Mesh, params):
    p_sh = params_shardings(mesh, params)
    opt_sh = OptState(momentum=p_sh)
    b_sh = batch_sharding(mesh)
    h_sh = hidden_sharding(mesh)
    rep = replicated(mesh)

    step = jax.jit(
        trainer._step_impl,
        in_shardings=(p_sh, opt_sh, (h_sh, h_sh), b_sh, b_sh, rep, rep, rep),
        # pin outputs too: without this GSPMD may emit the new hidden with a
        # propagated (…, tp) sharding that then mismatches the declared input
        # sharding when fed back on the next step
        out_shardings=(p_sh, opt_sh, (h_sh, h_sh), rep, rep, rep, rep),
        donate_argnums=(0, 1),
    )
    return step, p_sh, b_sh, h_sh


def place(tree, shardings):
    return jax.device_put(tree, shardings)
