"""End-to-end training: loss decreases on a tiny synthetic corpus; the
plateau scheduler halves the LR, reloads best params, and early-stops."""

import math
import os

import numpy as np
import pytest

from bayeslms_tpu import ModelConfig, TrainConfig
from bayeslms_tpu.core.checkpoint import (
    load_checkpoint,
    partial_update,
    save_checkpoint,
)
from bayeslms_tpu.train.loop import Trainer


class TinyCorpus:
    """Highly learnable periodic token stream."""

    def __init__(self, V=20, n=3000):
        t = np.arange(n)
        self.train = ((t * 3) % (V - 2) + 1).astype(np.int32)
        self.valid = self.train[:600].copy()
        self.test = self.train[:600].copy()


def test_fit_lstm_learns_and_saves(tmp_path):
    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=12, nhid=12, dropout=0.0)
    tcfg = TrainConfig(
        lr=1.0, batch_size=4, eval_batch_size=4, epochs=3, seq_len=10,
        log_interval=10**9, save=str(tmp_path / "m.ckpt"),
    )
    trainer = Trainer(cfg, tcfg)
    corpus = TinyCorpus()
    state, out = trainer.fit(corpus, log=lambda *a: None)
    assert os.path.exists(tcfg.save)
    # a deterministic periodic stream is near-perfectly learnable
    assert out["history"][-1]["val_loss"] < out["history"][0]["val_loss"]
    assert out["test_loss"] < math.log(20)  # far better than uniform


def test_plateau_scheduler_halves_and_reloads(tmp_path):
    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8, dropout=0.0)
    # lr=0 -> no learning -> epoch 2 plateaus immediately
    tcfg = TrainConfig(
        lr=0.0, batch_size=4, eval_batch_size=4, epochs=3, seq_len=10,
        log_interval=10**9, save=str(tmp_path / "m.ckpt"), max_plateaus=2,
    )
    trainer = Trainer(cfg, tcfg)
    state, out = trainer.fit(TinyCorpus(V=20, n=800), log=lambda *a: None)
    assert state.plateaus >= 1
    assert state.lr < tcfg.lr + 1e-12 or state.lr == 0.0


def test_bayes_kl_enters_loss(tmp_path):
    """Bayesian training step returns a nonzero KL component."""
    import jax
    import jax.numpy as jnp
    from bayeslms_tpu.data.corpus import batchify, windows
    from bayeslms_tpu.models.lstm_lm import init_hidden
    from bayeslms_tpu.train.optim import init_opt_state

    cfg = ModelConfig(
        model="LSTM", vocab_size=20, emsize=8, nhid=8, dropout=0.0,
        uncertainty="Bayesian", l_bayes_pos=2,
    )
    tcfg = TrainConfig(batch_size=4, seq_len=10, save=str(tmp_path / "m.ckpt"))
    trainer = Trainer(cfg, tcfg)
    state = trainer.init_state()
    rows = batchify(TinyCorpus(n=500).train, 4)
    d, t = windows(rows, 10)
    out = trainer._train_step(
        state.params, state.opt_state, init_hidden(2, 4, 8),
        jnp.asarray(d[0]), jnp.asarray(t[0]),
        jnp.asarray(0.1), jnp.asarray(10.0 / rows.shape[0]), jax.random.key(0),
    )
    kl = float(out[5])
    assert kl != 0.0


def test_prior_partial_load(tmp_path):
    """Finetune-from-prior: matching keys overwritten, new lgstd keys kept."""
    base_cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8,
                           uncertainty="Bayesian", l_bayes_pos=0)
    bayes_cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8,
                            uncertainty="Bayesian", l_bayes_pos=2)
    t1 = Trainer(base_cfg, TrainConfig(save=str(tmp_path / "p.ckpt")))
    s1 = t1.init_state()
    save_checkpoint(str(tmp_path / "p.ckpt"), s1.params)

    t2 = Trainer(
        bayes_cfg,
        TrainConfig(prior=True, prior_path=str(tmp_path / "p.ckpt"),
                    save=str(tmp_path / "m.ckpt")),
    )
    s2 = t2.init_state()
    # means came from the prior
    np.testing.assert_array_equal(
        np.asarray(s2.params["core"]["weight_ih_mean_1"]),
        np.asarray(s1.params["core"]["weight_ih_mean_1"]),
    )
    # lgstd params exist only in the Bayes model and keep their fresh init
    assert "weight_ih_lgstd_1" in s2.params["core"]
    assert "weight_ih_lgstd_1" not in s1.params["core"]


def test_resume_continues_schedule(tmp_path):
    """Interrupt after 2 epochs; resuming runs epochs 3+ with the schedule
    state (lr/best/plateaus) intact and reaches the same quality ballpark."""
    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=10, nhid=10, dropout=0.0)
    save = str(tmp_path / "m.ckpt")
    corpus = TinyCorpus()

    t1 = Trainer(cfg, TrainConfig(lr=1.0, batch_size=4, eval_batch_size=4,
                                  epochs=2, seq_len=10, log_interval=10**9,
                                  save=save, resume=True))
    s1, out1 = t1.fit(corpus, log=lambda *a: None)
    assert os.path.exists(save + ".resume")

    t2 = Trainer(cfg, TrainConfig(lr=1.0, batch_size=4, eval_batch_size=4,
                                  epochs=4, seq_len=10, log_interval=10**9,
                                  save=save, resume=True))
    msgs = []
    s2, out2 = t2.fit(corpus, log=msgs.append)
    assert any("resumed from epoch 2" in str(m) for m in msgs)
    # continued run covers epochs 3..4 only
    assert [h["epoch"] for h in out2["history"]] == [3, 4]
    assert out2["history"][-1]["val_loss"] <= out1["history"][-1]["val_loss"] + 0.05


def test_prior_kl_pulls_means_toward_prior(tmp_path):
    """TrainConfig.prior_kl: the KL term's gradient pulls the Bayesian
    gate-slice means toward the loaded prior (reference model.py:767-775
    semantics). Deterministic single-step comparison: from the SAME state
    and step key, the prior-KL update must land the means closer to the
    prior than the plain update."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from bayeslms_tpu.models.lstm_lm import init_hidden
    from bayeslms_tpu.train.optim import init_opt_state

    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=10, nhid=10,
                      dropout=0.0, uncertainty="Bayesian", l_bayes_pos=2)

    prior_trainer = Trainer(cfg, TrainConfig(batch_size=4, seq_len=10))
    prior_params = prior_trainer.init_state(seed=99).params
    prior_path = str(tmp_path / "prior.ckpt")
    save_checkpoint(prior_path, prior_params)

    def dist_after_step(prior_kl):
        tcfg = TrainConfig(lr=1.0, batch_size=4, seq_len=10,
                           prior=True, prior_path=prior_path, prior_kl=prior_kl,
                           save=str(tmp_path / f"m{prior_kl}.ckpt"))
        trainer = Trainer(cfg, tcfg)
        state = trainer.init_state(seed=0)
        # perturb the means AWAY from the prior so there is a distance to close
        f = flatten_dict(state.params)
        for k in list(f):
            if "weight_ih_mean_1" in "/".join(k) or "weight_hh_mean_1" in "/".join(k):
                f[k] = f[k] + 0.5
        from flax.traverse_util import unflatten_dict
        params = unflatten_dict(f)
        data = jnp.ones((10, 4), jnp.int32)
        out = trainer._train_step(
            params, init_opt_state(params), init_hidden(2, 4, 10), data, data,
            jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
            jax.random.key(0),
        )
        fu = flatten_dict(jax.device_get(out[0]))
        fp = flatten_dict(jax.device_get(prior_params))
        keys = [k for k in fu if "weight_ih_mean_1" in "/".join(k)
                or "weight_hh_mean_1" in "/".join(k)]
        assert keys
        return sum(float(jnp.sum((jnp.asarray(fu[k]) - jnp.asarray(fp[k])) ** 2))
                   for k in keys)

    assert dist_after_step(True) < dist_after_step(False)


def test_ragged_final_window_matches_unpadded_step(tmp_path):
    """The epoch's final ragged window (reference train.py:315-316) is run
    padded+masked; its parameter update must equal an unpadded short-window
    step exactly (causality: masked positions cannot influence real ones)."""
    import jax
    import jax.numpy as jnp

    from bayeslms_tpu.data.corpus import batchify, windows
    from bayeslms_tpu.models.lstm_lm import init_hidden

    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8, dropout=0.0)
    tcfg = TrainConfig(
        lr=0.5, batch_size=4, eval_batch_size=4, epochs=1, seq_len=10,
        log_interval=10**9, save=str(tmp_path / "m.ckpt"),
    )
    trainer = Trainer(cfg, tcfg)
    state = trainer.init_state()
    p0 = jax.tree.map(lambda x: x.copy(), state.params)

    rng = np.random.default_rng(0)
    stream = rng.integers(1, 20, size=37 * 4).astype(np.int32)
    rows = batchify(stream, 4)  # 37 rows -> 3 full windows + ragged tail of 6
    d_all, t_all, tail = windows(rows, 10, drop_ragged=False)
    assert d_all.shape[0] == 3 and tail is not None and tail[0].shape[0] == 6

    epoch_key = jax.random.key(123)
    state = trainer.run_epoch(state, rows, epoch_key, log=lambda *a: None)

    # Manual replication: full windows through the plain step, then the
    # UNPADDED ragged step through _step_impl directly (no mask, short T).
    params, opt = p0, trainer.init_state().opt_state
    opt = type(opt)(momentum=jax.tree.map(jnp.zeros_like, p0))
    hidden = init_hidden(cfg.nlayers, 4, cfg.nhid)
    kl_scale = 10 / rows.shape[0]
    for b in range(3):
        params, opt, hidden, *_ = trainer._step_impl(
            params, opt, hidden, jnp.asarray(d_all[b]), jnp.asarray(t_all[b]),
            jnp.asarray(tcfg.lr, jnp.float32), jnp.asarray(kl_scale, jnp.float32),
            jax.random.fold_in(epoch_key, b),
        )
    params, opt, hidden, *_ = trainer._step_impl(
        params, opt, hidden, jnp.asarray(tail[0]), jnp.asarray(tail[1]),
        jnp.asarray(tcfg.lr, jnp.float32), jnp.asarray(kl_scale, jnp.float32),
        jax.random.fold_in(epoch_key, 3),
    )
    ref_leaves, treedef = jax.tree.flatten(jax.device_get(params))
    got_leaves = treedef.flatten_up_to(jax.device_get(state.params))
    paths = [jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    for name, r, g in zip(paths, ref_leaves, got_leaves):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(r, np.float64),
            rtol=2e-4, atol=2e-6, err_msg=name,
        )


def test_ragged_final_window_transformer_fit(tmp_path):
    """TM fit over a corpus with a ragged tail stays finite and learns."""
    cfg = ModelConfig(
        model="Transformer", vocab_size=20, emsize=8, nhid=16, nlayers=1,
        nhead=2, dropout=0.0,
    )
    tcfg = TrainConfig(
        lr=0.5, batch_size=4, eval_batch_size=4, epochs=2, seq_len=10,
        log_interval=10**9, save=str(tmp_path / "m.ckpt"),
    )
    trainer = Trainer(cfg, tcfg)
    state, out = trainer.fit(TinyCorpus(V=20, n=1491), log=lambda *a: None)
    assert math.isfinite(out["test_loss"])
    assert out["history"][-1]["val_loss"] < math.log(20)


def test_ragged_final_window_variational_exact():
    """Variational KL is activation-dependent, so the epoch's ragged final
    window must run at its EXACT short shape (a padded window would compute
    KL from pad-step activations). run_epoch's update must equal the manual
    short-window step bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from bayeslms_tpu.data.corpus import batchify, windows
    from bayeslms_tpu.models.lstm_lm import init_hidden

    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8,
                      dropout=0.0, uncertainty="Variational", l_v_pos="11")
    tcfg = TrainConfig(
        lr=0.5, batch_size=4, eval_batch_size=4, epochs=1, seq_len=10,
        log_interval=10**9, save="/tmp/unused_var.ckpt",
    )
    trainer = Trainer(cfg, tcfg)
    state = trainer.init_state()
    p0 = jax.tree.map(lambda x: x.copy(), state.params)

    rng = np.random.default_rng(0)
    stream = rng.integers(1, 20, size=37 * 4).astype(np.int32)
    rows = batchify(stream, 4)
    d_all, t_all, tail = windows(rows, 10, drop_ragged=False)
    assert d_all.shape[0] == 3 and tail is not None and tail[0].shape[0] == 6

    epoch_key = jax.random.key(7)
    state = trainer.run_epoch(state, rows, epoch_key, log=lambda *a: None)

    params, opt = p0, trainer.init_state().opt_state
    opt = type(opt)(momentum=jax.tree.map(jnp.zeros_like, p0))
    hidden = init_hidden(cfg.nlayers, 4, cfg.nhid)
    kl_scale = 10 / rows.shape[0]
    for b in range(3):
        params, opt, hidden, *_ = trainer._step_impl(
            params, opt, hidden, jnp.asarray(d_all[b]), jnp.asarray(t_all[b]),
            jnp.asarray(tcfg.lr, jnp.float32), jnp.asarray(kl_scale, jnp.float32),
            jax.random.fold_in(epoch_key, b),
        )
    params, opt, hidden, *_ = trainer._step_impl(
        params, opt, hidden, jnp.asarray(tail[0]), jnp.asarray(tail[1]),
        jnp.asarray(tcfg.lr, jnp.float32), jnp.asarray(kl_scale, jnp.float32),
        jax.random.fold_in(epoch_key, 3),
    )
    ref_leaves, treedef = jax.tree.flatten(jax.device_get(params))
    got_leaves = treedef.flatten_up_to(jax.device_get(state.params))
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    for name, r, g in zip(paths, ref_leaves, got_leaves):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(r, np.float64),
            rtol=2e-4, atol=2e-6, err_msg=name,
        )
