"""Smaller capability pieces: GPNNNode, rewrite_nbest, profiling, orbax,
multihost no-op."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from bayeslms_tpu.models.layers import GPNNNode
from bayeslms_tpu.parallel.multihost import initialize_multihost, is_primary
from bayeslms_tpu.rescore.nbest import rewrite_nbest
from bayeslms_tpu.utils.profiling import StepTimer, device_memory_stats


def test_gpnnnode_forward_and_kl():
    m = GPNNNode(6, 4, gpnn_type=3)
    x = jnp.ones((5, 6))
    variables = m.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, x
    )
    det = m.apply(variables, x, deterministic=True)
    assert det.shape == (5, 4)
    sampled = m.apply(variables, x, deterministic=False,
                      rngs={"sample": jax.random.key(2)})
    assert not np.allclose(np.asarray(det), np.asarray(sampled))
    kl = m.apply(variables, method=GPNNNode.kl)
    assert float(kl) != 0.0


def test_rewrite_nbest(tmp_path):
    p = tmp_path / "words.txt"
    p.write_text("u1-1 a b\nu1-2 c\nu2-1 d e f\nu2-2 g\n")
    n = rewrite_nbest(str(p), str(tmp_path / "out"))
    assert n == 2
    assert (tmp_path / "out" / "words.1").read_text() == "u1 a b\nu2 d e f\n"
    assert (tmp_path / "out" / "words.2").read_text() == "u1 c\nu2 g\n"


def test_step_timer():
    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None
    assert t.ema_ms >= 0


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) == 8  # virtual CPU mesh


def test_multihost_noop():
    assert initialize_multihost() is False  # single process
    assert is_primary()


def test_profile_dir_produces_trace(tmp_path):
    """TrainConfig.profile_dir wraps the first epoch in jax.profiler.trace
    (SURVEY §5 tracing item): trace artifacts must appear on disk."""
    import numpy as np

    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.train.loop import Trainer

    class TinyCorpus:
        train = (np.arange(600) % 17 + 1).astype(np.int32)
        valid = train[:100]
        test = train[:100]

    prof = tmp_path / "prof"
    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8, dropout=0.0)
    tcfg = TrainConfig(lr=0.5, batch_size=4, epochs=1, seq_len=8,
                       save=str(tmp_path / "m.ckpt"), profile_dir=str(prof))
    Trainer(cfg, tcfg).fit(TinyCorpus(), log=lambda *a: None)
    files = [p for p in prof.rglob("*") if p.is_file()]
    assert files, "no profiler trace artifacts written"


def test_checkpoint_save_is_atomic(tmp_path):
    """save_checkpoint must write temp+rename (multihost writers on a shared
    --save path, cli/main.py): no stray temp files, roundtrip intact, and a
    failed writer's leftover temp never clobbers the committed file."""
    from bayeslms_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "m.ckpt")
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_checkpoint(path, params, meta={"epoch": 1})
    # a crashed concurrent writer leaves only its own temp file behind
    (tmp_path / "m.ckpt.tmp.99999").write_bytes(b"torn")
    save_checkpoint(path, {"w": params["w"] * 2}, meta={"epoch": 2})
    got, meta = load_checkpoint(path)
    np.testing.assert_array_equal(got["w"], params["w"] * 2)
    assert meta["epoch"] == 2
    leftovers = [p.name for p in tmp_path.iterdir()
                 if ".tmp." in p.name and p.name != "m.ckpt.tmp.99999"]
    assert leftovers == [], leftovers


def test_quiet_gc_suppresses_and_restores():
    """quiet_gc disables the cyclic collector for the block (a gen-2 sweep
    of the JAX heap costs ~110 ms — longer than a warm rescoring pass),
    restores the prior state on exit, is nest- and exception-safe, and
    leaves an already-disabled collector untouched."""
    import gc

    from bayeslms_tpu.utils.gcquiet import quiet_gc

    gc.enable()  # force a known ambient state (order-independent)
    with quiet_gc():
        assert not gc.isenabled()
        with quiet_gc():  # nested block must not re-enable on its exit
            assert not gc.isenabled()
        assert not gc.isenabled()
    assert gc.isenabled()

    try:
        with quiet_gc():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert gc.isenabled()

    gc.disable()
    try:
        with quiet_gc():
            assert not gc.isenabled()
        assert not gc.isenabled()  # was disabled before: stays disabled
    finally:
        gc.enable()


def test_native_autobuild_gating(monkeypatch, tmp_path):
    """_try_autobuild runs `make -C tools` at most once per process, and
    BAYESLM_NO_AUTOBUILD=1 opts out entirely (a wiped build dir must not
    silently drop the native fast paths — but the opt-out must hold for
    environments where spawning make is unwanted)."""
    from bayeslms_tpu.data import native

    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)

        class R:
            returncode = 0

        return R()

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)

    # opt-out: no invocation, and the one-shot latch is NOT consumed
    monkeypatch.setattr(native, "_build_tried", False)
    monkeypatch.setenv("BAYESLM_NO_AUTOBUILD", "1")
    native._try_autobuild()
    assert calls == []
    assert native._build_tried is False

    # enabled: exactly one make invocation targeting the tools dir,
    # second call is a no-op (one attempt per process)
    monkeypatch.delenv("BAYESLM_NO_AUTOBUILD")
    native._try_autobuild()
    native._try_autobuild()
    assert len(calls) == 1
    assert calls[0][:2] == ["make", "-C"]
    assert calls[0][2].endswith("tools")
    assert native._build_tried is True

    # restore the module latch for other tests in this process
    monkeypatch.setattr(native, "_build_tried", False)
