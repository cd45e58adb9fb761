"""Training loop: MLE + scaled KL, SGD momentum, plateau scheduler.

Reference behaviors reproduced (train.py):
- loss = CE + kl * seq_len / len(train_rows)  (:332-412; the KL term is the
  sown sum from the position-dispatch, scaled by seq_len over the number of
  batchified rows)
- SGD momentum 0.9, global-norm clip (:418-420, :466)
- per-epoch validation; on improvement save best; otherwise halve LR, reload
  best checkpoint AND reset the optimizer, stop after 8 plateaus (:496-512)
- LSTM hidden state carried (detached) across windows within an epoch,
  reinitialized each epoch (:313-326)
- eval: deterministic (posterior mean, no dropout), token-exact PPL
  including the ragged final window (:441-458)

TPU notes: one jitted step per (train/eval) graph; LR and KL scale are step
arguments so schedule changes never recompile; epochs stream pre-stacked
static-shape windows, and the final ragged window (reference train.py:315-316)
runs through a padded+masked step variant so the schedule is token-exact.
"""

from __future__ import annotations

import dataclasses
import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import load_checkpoint, partial_update, save_checkpoint
from ..core.config import ModelConfig, TrainConfig
from ..core.registry import build_model, init_params, sum_losses
from ..data.corpus import apply_data_fraction, batchify, get_batch, windows
from ..models.lstm_lm import init_hidden
from ..utils.profiling import StepTimer, trace
from .optim import OptState, init_opt_state, sgd_momentum_step


def cross_entropy(logits, targets, mask=None):
    """Token CE; mean over (masked) tokens — torch CrossEntropyLoss parity."""
    V = logits.shape[-1]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, V), targets.reshape(-1)
    )
    if mask is None:
        return ce.mean(), ce.sum()
    m = mask.reshape(-1)
    return (ce * m).sum() / jnp.maximum(m.sum(), 1), (ce * m).sum()


@dataclass
class TrainerState:
    params: dict
    opt_state: OptState
    lr: float
    best_val_loss: Optional[float]
    plateaus: int
    epoch: int


class Trainer:
    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig, mesh=None):
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.model = build_model(model_cfg)
        self.is_tm = model_cfg.is_transformer
        # Data-parallel SPMD: with dp_shards > 1 (or an explicit mesh) the
        # train step is jitted with NamedShardings — batch sharded over the
        # `dp` axis, params replicated/tp-sharded per parallel/mesh.py rules;
        # XLA inserts the gradient all-reduce over ICI.
        self.mesh = mesh
        if mesh is None and train_cfg.dp_shards > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(dp=train_cfg.dp_shards, tp=1)
        # Fused decode+CE training path (ops/ce_pallas.py custom VJP): the
        # (T*B, V) logits never hit HBM in forward OR backward — backward
        # recomputes score tiles from saved (max, sumexp) stats. Applies
        # single-chip and inside the shard_map dp step; tp>1 GSPMD meshes use
        # the vocab-sharded variant below. Opt out with
        # BAYESLM_FUSED_CE_TRAIN=0.
        import os as _os

        from ..ops.ce_pallas import fused_ce_ok

        _dim = model_cfg.emsize if model_cfg.is_transformer else model_cfg.nhid
        _fused_env = _os.environ.get("BAYESLM_FUSED_CE_TRAIN", "1") != "0"
        _fused_base = (
            _fused_env
            and model_cfg.tied
            and fused_ce_ok(_dim)
            and model_cfg.vocab_size >= 4096
        )
        _tp = self.mesh.shape.get("tp", 1) if self.mesh is not None else 1
        _dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        # Pure-dp meshes run the train step as a shard_map over the batch
        # axis (parallel/train_parallel.py): each shard executes the FULL
        # single-chip fused-kernel path on its local batch (pallas calls are
        # opaque to GSPMD and would otherwise force all-gathers). tp>1 stays
        # on GSPMD partitioning with the pallas paths trace-disabled
        # (ops/kernel_gate.py).
        self.use_shardmap_dp = (
            self.mesh is not None
            and _tp == 1
            and "dp" in self.mesh.axis_names
            and train_cfg.batch_size % max(_dp, 1) == 0
        )
        self.use_fused_ce_train = _fused_base and (
            (self.mesh is None and train_cfg.dp_shards <= 1)
            or self.use_shardmap_dp
        )
        # tp>1 shard_map step (parallel/train_parallel.py round 5): batch
        # sharded over dp x tp for the model body (ALL Pallas fast paths
        # kept), embedding/decoder vocab-sharded over tp with masked-lookup
        # psum in and fused-CE partial merge out. Supersedes the GSPMD tp
        # path whenever the fused CE is available and shapes divide evenly.
        self.use_shardmap_tp = (
            _fused_base
            and self.mesh is not None
            and _tp > 1
            and model_cfg.vocab_size % _tp == 0
            and train_cfg.batch_size % (_dp * _tp) == 0
            and not (model_cfg.is_transformer
                     and model_cfg.uncertainty == "Bayesian"
                     and model_cfg.t_bayes_pos == "EMB")
        )
        # GSPMD mesh variant (ops/ce_pallas.py fused_decode_ce_train_spmd):
        # the same kernels per vocab shard inside shard_map, stitched with a
        # logsumexp merge — no logit materialization per chip and no decoder
        # all-gather. Requires even vocab/batch division.
        self.use_fused_ce_train_spmd = (
            _fused_base
            and self.mesh is not None
            and not self.use_shardmap_dp
            and not self.use_shardmap_tp
            and model_cfg.vocab_size % _tp == 0
            and train_cfg.batch_size % max(_dp, 1) == 0
        )
        self._train_step = jax.jit(self._step_impl, donate_argnums=(0, 1))
        # Masked variant for the epoch's final ragged window — built lazily
        # (one extra compile only when the corpus actually has a ragged tail).
        self._train_step_masked = None

        def _eval_gated(*args):
            # under a tp>1 mesh, eval runs GSPMD-partitioned (params carry
            # tensor-parallel shardings) — keep the opaque pallas eval
            # kernels out of the trace like the train step does
            if self.mesh is not None and self.mesh.shape.get("tp", 1) > 1:
                from ..ops.kernel_gate import no_pallas

                with no_pallas():
                    return self._eval_impl(*args)
            return self._eval_impl(*args)

        self._eval_step = jax.jit(_eval_gated)
        self._shard_ready = False
        # Prior-mean KL (TrainConfig.prior_kl): prior param tree passed to
        # apply as the "priors" collection; Bayes modules read their own
        # scope's mean leaves. Populated by init_state.
        self.priors: dict = {}

    # ------------------------------------------------------------------ init
    def init_state(self, seed: Optional[int] = None) -> TrainerState:
        seed = self.tcfg.seed if seed is None else seed
        params = init_params(
            self.model, self.mcfg, seed=seed,
            seq_len=min(self.tcfg.seq_len, self.mcfg.v_seq_len), batch=2,
        )
        if self.tcfg.prior and self.tcfg.prior_path:
            prior_params, _ = load_checkpoint(self.tcfg.prior_path)
            params, updated = partial_update(params, prior_params)
            print(f"prior init: updated {len(updated)} param tensors")
            if self.tcfg.prior_kl:
                self.priors = jax.tree.map(jnp.asarray, prior_params)
        return TrainerState(
            params=params,
            opt_state=init_opt_state(params),
            lr=self.tcfg.lr,
            best_val_loss=None,
            plateaus=0,
            epoch=0,
        )

    # ------------------------------------------------------------------ steps
    def _apply_train(self, params, data, hidden, rngs):
        variables = {"params": params}
        if self.priors:
            variables["priors"] = self.priors
        if self.is_tm:
            logits, var = self.model.apply(
                variables, data, deterministic=False, rngs=rngs,
                mutable=["losses"],
            )
            return logits, hidden, var
        (logits, hidden), var = self.model.apply(
            variables, data, hidden, deterministic=False, rngs=rngs,
            mutable=["losses"],
        )
        return logits, hidden, var

    def _apply_train_hidden(self, params, data, hidden, rngs, emb_in=None):
        """Forward returning pre-decoder states (for the fused CE path).

        ``emb_in``: precomputed embedding rows — the tensor-parallel
        shard_map step embeds from its local vocab shard outside the model
        (parallel/train_parallel.py)."""
        variables = {"params": params}
        if self.priors:
            variables["priors"] = self.priors
        if self.is_tm:
            out, var = self.model.apply(
                variables, data, deterministic=False, rngs=rngs,
                mutable=["losses"], return_hidden=True, emb_in=emb_in,
            )
            return out, hidden, var
        (out, hidden), var = self.model.apply(
            variables, data, hidden, deterministic=False, rngs=rngs,
            mutable=["losses"], return_hidden=True, emb_in=emb_in,
        )
        return out, hidden, var

    def _step_impl(self, params, opt_state, hidden, data, target, lr, kl_scale,
                   step_key, dp_axis=None, mask=None):
        """``dp_axis``: set when running as a shard_map body over a dp mesh —
        dropout streams fold in the shard index (independent masks per data
        shard) while the WEIGHT sample key stays shared (one posterior draw
        per optimizer step across the whole batch, reference semantics), and
        gradients/metrics are pmean'ed before the update so every shard
        applies the identical replicated step.

        ``mask``: (T, B) 0/1 for the epoch's final ragged window — the
        reference steps on it (train.py:315-316) with CE averaged over the
        real tokens and the KL scale unchanged (fixed ``args.seq_len``). The
        window is padded to static T; causality (LSTM forward recurrence /
        TM causal attention) makes the masked CE gradient exact."""
        d_key, s_key = jax.random.split(step_key)
        if dp_axis is not None:
            d_key = jax.random.fold_in(d_key, jax.lax.axis_index(dp_axis))
        rngs = {"dropout": d_key, "sample": s_key}

        def _mean(ce):
            if mask is None:
                return ce.mean()
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)

        def loss_fn(p):
            if self.use_fused_ce_train:
                from ..ops.ce_pallas import fused_decode_ce_train

                out, new_hidden, var = self._apply_train_hidden(p, data, hidden, rngs)
                ce = fused_decode_ce_train(
                    out, p["embedding"], p["decoder_b"], target
                )
                mle = _mean(ce)
            elif self.use_fused_ce_train_spmd:
                from ..ops.ce_pallas import fused_decode_ce_train_spmd

                out, new_hidden, var = self._apply_train_hidden(p, data, hidden, rngs)
                ce = fused_decode_ce_train_spmd(
                    out, p["embedding"], p["decoder_b"], target, self.mesh
                )
                mle = _mean(ce)
            else:
                logits, new_hidden, var = self._apply_train(p, data, hidden, rngs)
                mle, _ = cross_entropy(logits, target, mask)
            kl = sum_losses(var.get("losses", {})) * kl_scale
            return mle + kl, (mle, kl, new_hidden)

        (loss, (mle, kl, new_hidden)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if dp_axis is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            loss = jax.lax.pmean(loss, dp_axis)
            mle = jax.lax.pmean(mle, dp_axis)
            kl = jax.lax.pmean(kl, dp_axis)
        params, opt_state, gnorm = sgd_momentum_step(
            params, grads, opt_state, lr, self.tcfg.clip, self.tcfg.momentum
        )
        return params, opt_state, new_hidden, loss, mle, kl, gnorm

    def _eval_impl(self, params, hidden, data, target, mask):
        """data/target/mask: (n, T, B) stacked eval windows, scanned on
        device with hidden carry — ONE host round trip per eval pass.

        (Measured: routing eval through the fused decode+CE kernel gives no
        win at eval batch sizes while adding ~200 s of compile; the XLA
        decoder stays. The fused kernel earns its keep in the rescorer.)"""

        def body(h, inp):
            d, t, m = inp
            if self.is_tm:
                logits = self.model.apply({"params": params}, d, deterministic=True)
            else:
                logits, h = self.model.apply(
                    {"params": params}, d, h, deterministic=True
                )
            _, ce_sum = cross_entropy(logits, t, m)
            return h, ce_sum

        _, sums = jax.lax.scan(body, hidden, (data, target, mask))
        return jnp.sum(sums)

    def _put_global(self, x, sh):
        """Place a host value with sharding ``sh`` — works when the mesh
        spans PROCESSES (multi-host DCN): non-trivially-sharded numpy inputs
        are rejected by jit there, so shards are assembled per process via
        make_array_from_callback (each host holds the full value; the
        callback serves its local index slices)."""
        if isinstance(x, jax.Array):
            return x  # already placed (fit feeds back the step outputs)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    def _put_batch(self, arr):
        if self.mesh is None or jax.process_count() == 1:
            return jnp.asarray(arr)
        return self._put_global(arr, self._b_sh)

    def _ensure_sharded(self, params):
        """Build the sharded step + placement helpers on first use."""
        if self._shard_ready or self.mesh is None:
            return
        from ..parallel.mesh import batch_sharding, hidden_sharding
        from ..parallel.train_parallel import make_sharded_train_step

        step, p_sh, b_sh, h_sh = make_sharded_train_step(self, self.mesh, params)
        self._train_step = step
        self._p_sh, self._b_sh, self._h_sh = p_sh, b_sh, h_sh
        self._masked_factory = lambda: make_sharded_train_step(
            self, self.mesh, params, masked=True
        )[0]
        self._shard_ready = True

    def _get_masked_step(self):
        if self._train_step_masked is None:
            if self.mesh is not None:
                self._train_step_masked = self._masked_factory()
            else:
                def masked(params, opt_state, hidden, data, target, lr,
                           kl_scale, step_key, mask):
                    return self._step_impl(
                        params, opt_state, hidden, data, target, lr, kl_scale,
                        step_key, mask=mask,
                    )

                self._train_step_masked = jax.jit(masked, donate_argnums=(0, 1))
        return self._train_step_masked

    # ------------------------------------------------------------------ epoch
    def run_epoch(self, state: TrainerState, train_rows: np.ndarray, epoch_key, log=print):
        tcfg = self.tcfg
        data_all, tgt_all, tail = windows(train_rows, tcfg.seq_len, drop_ragged=False)
        kl_scale = tcfg.seq_len / train_rows.shape[0]
        hidden = init_hidden(self.mcfg.nlayers, train_rows.shape[1], self.mcfg.nhid)
        self._ensure_sharded(state.params)
        if self.mesh is not None:
            state.params = jax.tree.map(self._put_global, state.params, self._p_sh)
            state.opt_state = type(state.opt_state)(
                momentum=jax.tree.map(
                    self._put_global, state.opt_state.momentum, self._p_sh
                )
            )
            hidden = jax.tree.map(
                self._put_global, hidden, (self._h_sh, self._h_sh)
            )
        params, opt_state = state.params, state.opt_state
        t0 = time.time()
        n = data_all.shape[0]
        # Losses stay ON DEVICE between log points: a device->host fetch costs
        # ~25 ms through the TPU tunnel, so fetching per step would dominate
        # the step itself. Dispatch runs ahead asynchronously; we sync once
        # per log_interval.
        pending = []
        timer = StepTimer(alpha=0.3)  # interval-level EMA
        for b in range(n):
            step_key = jax.random.fold_in(epoch_key, b)
            params, opt_state, hidden, loss, mle, kl, gnorm = self._train_step(
                params, opt_state, hidden,
                self._put_batch(data_all[b]), self._put_batch(tgt_all[b]),
                jnp.asarray(state.lr, jnp.float32), jnp.asarray(kl_scale, jnp.float32),
                step_key,
            )
            pending.append(loss)
            if b % tcfg.log_interval == 0 and b > 0:
                cur = float(jnp.mean(jnp.stack(pending)))
                ms = timer.update((time.time() - t0) * 1000 / len(pending))
                pending = []
                log(
                    f"| epoch {state.epoch:3d} | {b:5d}/{n:5d} batches | lr {state.lr:02.3f} "
                    f"| ms/batch {ms:5.2f} | loss {cur:5.2f} | kl {float(kl):5.4f} "
                    f"| ppl {math.exp(min(cur, 30)):8.2f}"
                )
                t0 = time.time()
        if tail is not None:
            # Final ragged window (reference train.py:315-316 steps on it;
            # KL scale unchanged).
            d_t, t_t = tail
            cur, bsz = d_t.shape
            L = tcfg.seq_len
            if self.mcfg.uncertainty == "Variational":
                # Variational KL is ACTIVATION-dependent (VNN/VLSTM sow KL
                # from hidden activations, models/lstm_lm.py; VEncoderLayer
                # gates noise on the actual window length, reference
                # model.py:2756-2805) — on a padded window the KL would be
                # computed from pad-step activations and the TM length gate
                # would fire when the reference's short window would not.
                # Run the short window at its EXACT shape instead (one extra
                # compile; reference semantics).
                params, opt_state, hidden, loss, mle, kl, gnorm = self._train_step(
                    params, opt_state, hidden,
                    self._put_batch(np.ascontiguousarray(d_t)),
                    self._put_batch(np.ascontiguousarray(t_t)),
                    jnp.asarray(state.lr, jnp.float32),
                    jnp.asarray(kl_scale, jnp.float32),
                    jax.random.fold_in(epoch_key, n),
                )
            else:
                # CE is masked-exact and the KL of every other family is
                # weight-space (padding-independent) — pad to the static
                # seq_len so the epoch stays one compiled shape.
                data_p = np.zeros((L, bsz), dtype=train_rows.dtype)
                tgt_p = np.zeros((L, bsz), dtype=train_rows.dtype)
                m_p = np.zeros((L, bsz), dtype=np.float32)
                data_p[:cur], tgt_p[:cur], m_p[:cur] = d_t, t_t, 1.0
                params, opt_state, hidden, loss, mle, kl, gnorm = self._get_masked_step()(
                    params, opt_state, hidden,
                    self._put_batch(data_p), self._put_batch(tgt_p),
                    jnp.asarray(state.lr, jnp.float32), jnp.asarray(kl_scale, jnp.float32),
                    jax.random.fold_in(epoch_key, n), self._put_batch(m_p),
                )
        state.params, state.opt_state = params, opt_state
        return state

    def evaluate(self, params, rows: np.ndarray) -> float:
        """Token-exact mean CE over a batchified (rows, bsz) stream (includes
        the ragged final window, reference train.py:441-458)."""
        tcfg = self.tcfg
        L = tcfg.seq_len
        bsz = rows.shape[1]
        starts = list(range(0, rows.shape[0] - 1, L))
        n = len(starts)
        data = np.zeros((n, L, bsz), rows.dtype)
        target = np.zeros((n, L, bsz), rows.dtype)
        mask = np.zeros((n, L, bsz), np.float32)
        for j, i in enumerate(starts):
            d, t = get_batch(rows, i, L)
            cur = d.shape[0]
            data[j, :cur], target[j, :cur], mask[j, :cur] = d, t, 1.0
        hidden = init_hidden(
            self.mcfg.nlayers, bsz, self.mcfg.nhid,
            dtype=jnp.dtype(self.mcfg.compute_dtype),
        )
        total = float(
            self._eval_step(
                params, hidden, jnp.asarray(data), jnp.asarray(target), jnp.asarray(mask)
            )
        )
        return total / (bsz * (rows.shape[0] - 1))

    # ------------------------------------------------------------------ resume
    def _save_resume(self, state: TrainerState):
        """Full training-state snapshot (params + momentum + schedule) so an
        interrupted run continues exactly. The reference's --resume flag was
        wired but commented out (train.py:92-93, :108-118); here it works."""
        save_checkpoint(
            self.tcfg.save + ".resume",
            {"params": state.params, "momentum": state.opt_state.momentum},
            meta={
                "epoch": state.epoch,
                "lr": state.lr,
                "best_val_loss": state.best_val_loss,
                "plateaus": state.plateaus,
            },
        )

    def _try_resume(self) -> Optional[TrainerState]:
        import os

        path = self.tcfg.save + ".resume"
        if not (self.tcfg.resume and os.path.exists(path)):
            return None
        blob, meta = load_checkpoint(path)
        params = jax.tree.map(jnp.asarray, blob["params"])
        return TrainerState(
            params=params,
            opt_state=OptState(momentum=jax.tree.map(jnp.asarray, blob["momentum"])),
            lr=float(meta["lr"]),
            best_val_loss=meta["best_val_loss"],
            plateaus=int(meta["plateaus"]),
            epoch=int(meta["epoch"]),
        )

    # ------------------------------------------------------------------ fit
    def fit(self, corpus, log=print):
        tcfg = self.tcfg
        train_stream = apply_data_fraction(corpus.train, tcfg.data_fraction)
        train_rows = batchify(train_stream, tcfg.batch_size)
        val_rows = batchify(corpus.valid, tcfg.eval_batch_size)
        test_rows = batchify(corpus.test, tcfg.eval_batch_size)

        resumed = self._try_resume()
        state = resumed if resumed is not None else self.init_state()
        start_epoch = state.epoch + 1 if resumed is not None else 1
        if resumed is not None:
            log(f"resumed from epoch {state.epoch} (lr {state.lr})")
        root_key = jax.random.key(tcfg.seed, impl=tcfg.rng_impl)
        history = []
        for epoch in range(start_epoch, tcfg.epochs + 1):
            state.epoch = epoch
            t0 = time.time()
            epoch_key = jax.random.fold_in(root_key, epoch)
            if tcfg.profile_dir and epoch == start_epoch:
                # trace the first trained epoch (SURVEY §5 tracing item)
                with trace(tcfg.profile_dir):
                    state = self.run_epoch(state, train_rows, epoch_key, log)
            else:
                state = self.run_epoch(state, train_rows, epoch_key, log)
            val_loss = self.evaluate(state.params, val_rows)
            log("-" * 89)
            log(
                f"| end of epoch {epoch:3d} | time: {time.time() - t0:5.2f}s "
                f"| valid loss {val_loss:5.2f} | valid ppl {math.exp(min(val_loss, 30)):8.2f}"
            )
            log("-" * 89)
            history.append({"epoch": epoch, "val_loss": val_loss, "lr": state.lr})

            if state.best_val_loss is None or val_loss < state.best_val_loss:
                save_checkpoint(
                    tcfg.save, state.params,
                    meta={"epoch": epoch, "val_loss": val_loss,
                          # lets downstream consumers (the CLI's --inter_path
                          # second model) rebuild the exact ModelConfig
                          "model_config": dataclasses.asdict(self.mcfg)},
                )
                state.best_val_loss = val_loss
            else:
                # Plateau: halve LR, reload best params, fresh optimizer
                # (momentum reset), bump the early-stop counter.
                state.lr *= tcfg.lr_decay
                best, _ = load_checkpoint(tcfg.save, target=jax.device_get(state.params))
                state.params = jax.tree.map(jnp.asarray, best)
                state.opt_state = init_opt_state(state.params)
                state.plateaus += 1
            if tcfg.resume:
                self._save_resume(state)
            if state.plateaus >= tcfg.max_plateaus:
                break

        best, _ = load_checkpoint(tcfg.save, target=jax.device_get(state.params))
        state.params = jax.tree.map(jnp.asarray, best)
        test_loss = self.evaluate(state.params, test_rows)
        log("=" * 89)
        log(
            f"| End of training | test loss {test_loss:5.2f} "
            f"| test ppl {math.exp(min(test_loss, 30)):8.2f}"
        )
        log("=" * 89)
        return state, {"history": history, "test_loss": test_loss}
