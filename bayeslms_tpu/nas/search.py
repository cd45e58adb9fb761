"""NAS search loop: interleaved architecture and weight optimization.

Reference: train_search_bayes.py:247-343 — per batch, an Architect step on a
validation batch followed by a weight step (MLE + arch-weighted branch KL,
clip, SGD momentum) on a training batch; per-epoch softmaxed arch weights
are the search result (:354-357, :402-411).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import ModelConfig, TrainConfig
from ..core.registry import sum_losses
from ..data.corpus import batchify, windows
from ..models.lstm_lm import init_hidden
from ..train.optim import init_opt_state, sgd_momentum_step
from .architect import Architect
from .supernet import build_supernet, init_arch_weights


@dataclass
class SearchResult:
    arch_softmax: np.ndarray  # (nlayers, slots, 2)
    history: list


class SearchRunner:
    def __init__(self, cfg: ModelConfig, tcfg: TrainConfig, mode: str = "bayes",
                 unrolled: bool = False, arch_lr: float = 3e-3,
                 network_weight_decay: float = 5e-7):
        self.cfg = cfg
        self.tcfg = tcfg
        self.model = build_supernet(cfg, mode)
        self.is_tm = cfg.is_transformer
        self.slots = 1 if self.is_tm else 4

        def loss_fn(params, arch, batch, rngs):
            data, target, hidden, kl_scale = batch
            if self.is_tm:
                logits, var = self.model.apply(
                    {"params": params}, data, arch, deterministic=False, rngs=rngs,
                    mutable=["losses"],
                )
            else:
                (logits, _), var = self.model.apply(
                    {"params": params}, data, hidden, arch, deterministic=False,
                    rngs=rngs, mutable=["losses"],
                )
            V = logits.shape[-1]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, V), target.reshape(-1)
            ).mean()
            return ce + kl_scale * sum_losses(var.get("losses", {}))

        self.loss_fn = loss_fn
        self.architect = Architect(
            loss_fn, arch_lr=arch_lr, w_lr=tcfg.lr, unrolled=unrolled,
            network_weight_decay=network_weight_decay, network_clip=tcfg.clip,
        )
        self._w_step = jax.jit(self._weight_step)

    def _weight_step(self, params, opt_state, arch, batch, lr, rngs):
        loss, grads = jax.value_and_grad(self.loss_fn)(params, arch, batch, rngs)
        params, opt_state, _ = sgd_momentum_step(
            params, grads, opt_state, lr, self.tcfg.clip, self.tcfg.momentum
        )
        return params, opt_state, loss

    def init_params(self, seed: int = 0):
        rngs = {
            "params": jax.random.key(seed),
            "dropout": jax.random.key(seed + 1),
            "sample": jax.random.key(seed + 2),
            "gumbel": jax.random.key(seed + 3),
        }
        L = min(self.tcfg.seq_len, 8)
        tokens = jnp.zeros((L, 2), jnp.int32)
        arch = init_arch_weights(jax.random.key(seed + 4), self.cfg.nlayers, self.slots)
        if self.is_tm:
            variables = self.model.init(rngs, tokens, arch, deterministic=True)
        else:
            hidden = init_hidden(self.cfg.nlayers, 2, self.cfg.nhid)
            variables = self.model.init(rngs, tokens, hidden, arch, deterministic=True)
        return variables["params"], arch

    def run(self, corpus, epochs: Optional[int] = None, log=print) -> SearchResult:
        tcfg = self.tcfg
        epochs = epochs or tcfg.epochs
        train_rows = batchify(corpus.train, tcfg.batch_size)
        valid_rows = batchify(corpus.valid, tcfg.batch_size)
        tr_d, tr_t = windows(train_rows, tcfg.seq_len)
        va_d, va_t = windows(valid_rows, tcfg.seq_len)
        kl_scale = jnp.asarray(tcfg.seq_len / train_rows.shape[0], jnp.float32)

        params, arch = self.init_params(tcfg.seed)
        a_state = self.architect.init(arch)
        opt_state = init_opt_state(params)
        hidden = init_hidden(self.cfg.nlayers, tcfg.batch_size, self.cfg.nhid)
        root = jax.random.key(tcfg.seed)
        history = []
        for epoch in range(1, epochs + 1):
            for b in range(tr_d.shape[0]):
                k = jax.random.fold_in(jax.random.fold_in(root, epoch), b)
                kd, ks, kg = jax.random.split(k, 3)
                rngs = {"dropout": kd, "sample": ks, "gumbel": kg}
                vb = b % max(va_d.shape[0], 1)
                train_batch = (jnp.asarray(tr_d[b]), jnp.asarray(tr_t[b]), hidden, kl_scale)
                valid_batch = (jnp.asarray(va_d[vb]), jnp.asarray(va_t[vb]), hidden, kl_scale)
                # architect step on validation data, then weight step
                a_state = self.architect.step(a_state, params, train_batch, valid_batch, rngs)
                params, opt_state, loss = self._w_step(
                    params, opt_state, a_state.arch, train_batch,
                    jnp.asarray(tcfg.lr, jnp.float32), rngs,
                )
            soft = np.asarray(jax.nn.softmax(a_state.arch, axis=-1))
            history.append({"epoch": epoch, "loss": float(loss), "arch": soft.tolist()})
            log(f"| search epoch {epoch} | loss {float(loss):.3f} |\n{soft.round(3)}")
        return SearchResult(
            arch_softmax=np.asarray(jax.nn.softmax(a_state.arch, axis=-1)),
            history=history,
        )
