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
    derived_choice: Optional[np.ndarray] = None  # argmax branch per (layer, slot)


class SearchRunner:
    def __init__(self, cfg: ModelConfig, tcfg: TrainConfig, mode: str = "bayes",
                 unrolled: bool = False, arch_lr: float = 3e-3,
                 network_weight_decay: float = 5e-7):
        self.cfg = cfg
        self.tcfg = tcfg
        self.model = build_supernet(cfg, mode)
        self.is_tm = cfg.is_transformer
        self.slots = 1 if self.is_tm else 4

        def loss_and_hidden(params, arch, batch, rngs):
            data, target, hidden, kl_scale = batch
            if self.is_tm:
                logits, var = self.model.apply(
                    {"params": params}, data, arch, deterministic=False, rngs=rngs,
                    mutable=["losses"],
                )
                new_hidden = hidden
            else:
                (logits, new_hidden), var = self.model.apply(
                    {"params": params}, data, hidden, arch, deterministic=False,
                    rngs=rngs, mutable=["losses"],
                )
            V = logits.shape[-1]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, V), target.reshape(-1)
            ).mean()
            return ce + kl_scale * sum_losses(var.get("losses", {})), new_hidden

        self._loss_and_hidden = loss_and_hidden
        # scalar-only view for the Architect (its valid-batch hidden is the
        # per-epoch zero state, discarded per call — reference architect.py:62-67)
        self.loss_fn = lambda params, arch, batch, rngs: loss_and_hidden(
            params, arch, batch, rngs
        )[0]
        self.architect = Architect(
            self.loss_fn, arch_lr=arch_lr, w_lr=tcfg.lr, unrolled=unrolled,
            network_weight_decay=network_weight_decay, network_clip=tcfg.clip,
        )
        self._w_step = jax.jit(self._weight_step)

    def _weight_step(self, params, opt_state, arch, batch, lr, rngs):
        (loss, new_hidden), grads = jax.value_and_grad(
            self._loss_and_hidden, has_aux=True
        )(params, arch, batch, rngs)
        # weight_decay=1e-5: the search loop's SGD decays network weights
        # (train_search_bayes.py:387-388), unlike train.py's wd=0
        params, opt_state, _ = sgd_momentum_step(
            params, grads, opt_state, lr, self.tcfg.clip, self.tcfg.momentum,
            weight_decay=1e-5,
        )
        return params, opt_state, loss, new_hidden

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

    def run(self, corpus, epochs: Optional[int] = None, log=print,
            init=None) -> SearchResult:
        """``init``: optional (params, arch) override — the same-init twin
        harness imports the reference supernet's exact initial weights
        (tools/nas_sameinit_twin.py)."""
        tcfg = self.tcfg
        epochs = epochs or tcfg.epochs
        train_rows = batchify(corpus.train, tcfg.batch_size)
        valid_rows = batchify(corpus.valid, tcfg.batch_size)
        n_tr, n_va = train_rows.shape[0], valid_rows.shape[0]
        kl_scale = jnp.asarray(tcfg.seq_len / n_tr, jnp.float32)

        params, arch = init if init is not None else self.init_params(tcfg.seed)
        a_state = self.architect.init(arch)
        opt_state = init_opt_state(params)
        root = jax.random.key(tcfg.seed)
        history = []
        for epoch in range(1, epochs + 1):
            # reference train_search_bayes.py:245-246: BOTH hiddens re-zeroed
            # per epoch; `hidden` is then carried (detached) across weight
            # steps (:272-273) while `hiddens_valid` stays the zero state for
            # every architect step (architect.py:62-67 discards its output).
            hidden = init_hidden(self.cfg.nlayers, tcfg.batch_size, self.cfg.nhid)
            hidden_valid = init_hidden(self.cfg.nlayers, tcfg.batch_size, self.cfg.nhid)
            for b, i in enumerate(range(0, n_tr - 1, tcfg.seq_len)):
                k = jax.random.fold_in(jax.random.fold_in(root, epoch), b)
                kd, ks, kg = jax.random.split(k, 3)
                rngs = {"dropout": kd, "sample": ks, "gumbel": kg}
                # reference batch windows (train_search_bayes.py:247-249):
                # the train window is the epoch's i-th seq_len slice incl.
                # the ragged tail; the VALID window starts at token offset
                # i % (n_va - 1) — an unaligned sliding slice, not a
                # window-index lookup
                T = min(tcfg.seq_len, n_tr - 1 - i)
                vi = i % (n_va - 1)
                Tv = min(tcfg.seq_len, n_va - 1 - vi)
                train_batch = (jnp.asarray(train_rows[i : i + T]),
                               jnp.asarray(train_rows[i + 1 : i + 1 + T]),
                               hidden, kl_scale)
                valid_batch = (jnp.asarray(valid_rows[vi : vi + Tv]),
                               jnp.asarray(valid_rows[vi + 1 : vi + 1 + Tv]),
                               hidden_valid, kl_scale)
                # architect step on validation data, then weight step
                a_state = self.architect.step(a_state, params, train_batch, valid_batch, rngs)
                params, opt_state, loss, hidden = self._w_step(
                    params, opt_state, a_state.arch, train_batch,
                    jnp.asarray(tcfg.lr, jnp.float32), rngs,
                )
            soft = np.asarray(jax.nn.softmax(a_state.arch, axis=-1))
            history.append({"epoch": epoch, "loss": float(loss), "arch": soft.tolist()})
            log(f"| search epoch {epoch} | loss {float(loss):.3f} |\n{soft.round(3)}")
        soft = np.asarray(jax.nn.softmax(a_state.arch, axis=-1))
        return SearchResult(
            arch_softmax=soft,
            history=history,
            derived_choice=soft.argmax(axis=-1),
        )

    @staticmethod
    def derive(arch) -> jax.Array:
        """Argmax architecture as hard-selecting logits: softmax of ±50
        saturates to exact 1/0 branch weights in f32, so training the
        supernet with these (and no gumbel noise) trains exactly the chosen
        fixed architecture — the consumable form of the search result
        (the reference only prints softmaxed weights,
        train_search_bayes.py:402-411)."""
        a = np.asarray(arch)
        choice = a.argmax(axis=-1)
        hard = np.where(
            np.arange(a.shape[-1])[None, None, :] == choice[..., None], 50.0, -50.0
        )
        return jnp.asarray(hard, jnp.float32)

    def finetune(self, params, arch_hard, corpus, steps: int, seed: int = 0):
        """Train the DERIVED fixed architecture (hard arch logits from
        ``derive``) for ``steps`` weight steps. Returns (params, losses)."""
        tcfg = self.tcfg
        train_rows = batchify(corpus.train, tcfg.batch_size)
        tr_d, tr_t = windows(train_rows, tcfg.seq_len)
        kl_scale = jnp.asarray(tcfg.seq_len / train_rows.shape[0], jnp.float32)
        opt_state = init_opt_state(params)
        hidden = init_hidden(self.cfg.nlayers, tcfg.batch_size, self.cfg.nhid)
        root = jax.random.key(seed)
        losses = []
        for b in range(steps):
            k = jax.random.fold_in(root, b)
            kd, ks, kg = jax.random.split(k, 3)
            rngs = {"dropout": kd, "sample": ks, "gumbel": kg}
            i = b % tr_d.shape[0]
            batch = (jnp.asarray(tr_d[i]), jnp.asarray(tr_t[i]), hidden, kl_scale)
            params, opt_state, loss, hidden = self._w_step(
                params, opt_state, arch_hard, batch,
                jnp.asarray(tcfg.lr, jnp.float32), rngs,
            )
            losses.append(float(loss))
        return params, losses
