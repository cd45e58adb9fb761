"""Multi-chip sharding: the full sharded train step compiles and runs on the
8-device virtual CPU mesh (dp x tp), and sharded losses match single-device."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (100, 16, 8192)


def test_sharded_step_matches_single_device():
    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.models.lstm_lm import init_hidden
    from bayeslms_tpu.parallel.mesh import make_mesh
    from bayeslms_tpu.parallel.train_parallel import make_sharded_train_step, place
    from bayeslms_tpu.train.loop import Trainer
    from bayeslms_tpu.train.optim import init_opt_state

    cfg = ModelConfig(
        model="Transformer", vocab_size=64, emsize=16, nhid=32, nlayers=2,
        nhead=2, dropout=0.0, uncertainty="Bayesian", t_bayes_pos="FFN",
    )
    T, B = 8, 8
    trainer = Trainer(cfg, TrainConfig(batch_size=B, seq_len=T))
    state = trainer.init_state(seed=3)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 64, (T, B)).astype(np.int32)
    target = rng.integers(0, 64, (T, B)).astype(np.int32)
    hidden = init_hidden(cfg.nlayers, B, cfg.nhid)
    key = jax.random.key(7)
    lr = jnp.asarray(0.1, jnp.float32)
    ks = jnp.asarray(0.01, jnp.float32)

    # single-device reference
    ref = trainer._train_step(
        jax.tree.map(jnp.copy, state.params), init_opt_state(state.params), hidden,
        jnp.asarray(data), jnp.asarray(target), lr, ks, key,
    )
    ref_loss = float(ref[3])
    ref_params = jax.device_get(ref[0])

    # sharded
    mesh = make_mesh(dp=4, tp=2)
    with mesh:
        step, p_sh, b_sh, h_sh = make_sharded_train_step(trainer, mesh, state.params)
        params = place(state.params, p_sh)
        out = step(
            params, init_opt_state(params), place(hidden, (h_sh, h_sh)),
            place(jnp.asarray(data), b_sh), place(jnp.asarray(target), b_sh),
            lr, ks, key,
        )
        sh_loss = float(out[3])
        sh_params = jax.device_get(out[0])

    np.testing.assert_allclose(sh_loss, ref_loss, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        ref_params,
        sh_params,
    )


def test_trainer_fit_with_dp_shards(tmp_path):
    """Trainer.fit with dp_shards=4: the epoch runs through the sharded step
    and still learns."""
    import math
    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.train.loop import Trainer

    class TinyCorpus:
        def __init__(self, V=20, n=2000):
            t = np.arange(n)
            self.train = ((t * 3) % (V - 2) + 1).astype(np.int32)
            self.valid = self.train[:400].copy()
            self.test = self.train[:400].copy()

    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=12, nhid=12, dropout=0.0)
    tcfg = TrainConfig(lr=1.0, batch_size=8, eval_batch_size=4, epochs=2,
                       seq_len=10, log_interval=10**9,
                       save=str(tmp_path / "m.ckpt"), dp_shards=4)
    trainer = Trainer(cfg, tcfg)
    assert trainer.mesh is not None and trainer.mesh.shape["dp"] == 4
    state, out = trainer.fit(TinyCorpus(), log=lambda *a: None)
    assert out["history"][-1]["val_loss"] < out["history"][0]["val_loss"]
    assert out["test_loss"] < math.log(20)


def test_sharded_scorer_matches_single_device():
    """BatchScorer over a dp=8 mesh reproduces single-device scores exactly,
    in both the carry-over (chains sharded) and bucketed (batch sharded)
    modes — the SPMD replacement for the reference's nj=5 process array."""
    from collections import OrderedDict

    import numpy as np

    from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
    from bayeslms_tpu.parallel.mesh import make_mesh
    from bayeslms_tpu.rescore.scorer import BatchScorer

    V = 32
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
    model = build_model(cfg)
    params = init_params(model, cfg)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i

    rng = np.random.default_rng(0)
    nbest = OrderedDict()
    for r in range(5):  # 5 recordings -> 5 chains (padded to 8)
        for u in range(3):
            k = f"rec{r}_utt{u}"
            nbest[k] = [
                " ".join(f"w{rng.integers(2, V)}" for _ in range(rng.integers(2, 9)))
                for _ in range(4)
            ]

    stream = lambda k: k.split("_")[0]
    mesh = make_mesh(dp=8, tp=1)

    for rc in (RescoreConfig(carry_over=True, max_hyp_len=16),
               RescoreConfig(carry_over=False, max_hyp_len=16, batch_size=16)):
        single = BatchScorer(cfg, params, rc).score_nbest(nbest, w2i, stream_fn=stream)
        sharded = BatchScorer(cfg, params, rc, mesh=mesh).score_nbest(
            nbest, w2i, stream_fn=stream)
        for k in nbest:
            a = [s for _, s in single[k]]
            b = [s for _, s in sharded[k]]
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6, err_msg=k)
