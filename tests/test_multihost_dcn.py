"""Multi-host DCN: a real 2-process jax.distributed job on CPU proving the
dp mesh spans processes (SURVEY §2c/§7 — the TPU-native replacement for the
reference's queue/slurm job launchers, utils/parallel/*.pl).

Each worker pins ONE virtual CPU device, joins via initialize_multihost
(local coordinator), builds a dp=2 Mesh over the GLOBAL device list, and
runs a cross-process psum + a replicated jitted reduction over a global
array assembled from process-local shards — the exact machinery the
shard_map train step uses.
"""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
from bayeslms_tpu.parallel.multihost import initialize_multihost, is_primary

assert initialize_multihost(), "env contract not picked up"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, "mesh must span BOTH processes' devices"
assert len(jax.local_devices()) == 1

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("dp",))
pid = jax.process_index()
local = np.full((1, 4), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), local
)
assert garr.shape == (2, 4)

# replicated jitted reduction over the cross-process global array
mean = jax.jit(lambda x: x.mean(), out_shardings=NamedSharding(mesh, P()))(garr)
assert abs(float(mean) - 1.5) < 1e-6, float(mean)

# explicit cross-process collective (what grad-pmean in the dp train step is)
with mesh:
    s = jax.shard_map(
        lambda x: jax.lax.psum(x.sum(), "dp"),
        mesh=mesh, in_specs=P("dp"), out_specs=P(),
    )(garr)
assert abs(float(s) - 12.0) < 1e-6, float(s)  # 4*1 + 4*2

assert is_primary() == (pid == 0)
print("MULTIHOST_OK", pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_mesh(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        assert f"MULTIHOST_OK {pid}" in out


TRAIN_WORKER = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
from bayeslms_tpu.parallel.multihost import initialize_multihost

assert initialize_multihost()
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from bayeslms_tpu import ModelConfig, TrainConfig
from bayeslms_tpu.train.loop import Trainer
from bayeslms_tpu.data.corpus import batchify

mesh = Mesh(np.array(jax.devices()), ("dp",))
cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8, dropout=0.0)
tcfg = TrainConfig(lr=0.5, batch_size=4, epochs=1, seq_len=8, seed=3,
                   rng_impl="threefry2x32")
trainer = Trainer(cfg, tcfg, mesh=mesh)
state = trainer.init_state()
stream = (np.arange(800) % 17 + 1).astype(np.int32)
rows = batchify(stream, tcfg.batch_size)
state = trainer.run_epoch(state, rows, jax.random.key(9, impl=tcfg.rng_impl),
                          log=lambda *a: None)
leaves = jax.tree.leaves(jax.tree.map(lambda x: np.asarray(x), state.params))
digest = float(sum(np.abs(l).sum() for l in leaves))
print("DIGEST %.10f" % digest, flush=True)
"""


def test_two_process_train_epoch_matches_single(tmp_path):
    """A REAL training epoch over a dp=2 mesh spanning two processes (DCN
    collectives through the shard_map step) produces the same params as the
    single-process run — multi-host data parallelism end to end."""
    import re

    import numpy as np

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", TRAIN_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    digests = []
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        digests.append(float(re.search(r"DIGEST ([0-9.]+)", out).group(1)))
    assert digests[0] == digests[1]  # replicated update identical across hosts

    # single-process reference (dp=2 over 2 local virtual devices bit-matches
    # single-device per tests/test_multichip.py; here we pin the SAME dp=2
    # geometry so the comparison is exact)
    import jax
    from jax.sharding import Mesh

    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.data.corpus import batchify
    from bayeslms_tpu.train.loop import Trainer

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("dp",))
    cfg = ModelConfig(model="LSTM", vocab_size=20, emsize=8, nhid=8, dropout=0.0)
    tcfg = TrainConfig(lr=0.5, batch_size=4, epochs=1, seq_len=8, seed=3,
                       rng_impl="threefry2x32")
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    state = trainer.init_state()
    stream = (np.arange(800) % 17 + 1).astype(np.int32)
    rows = batchify(stream, tcfg.batch_size)
    state = trainer.run_epoch(state, rows,
                              jax.random.key(9, impl=tcfg.rng_impl),
                              log=lambda *a: None)
    leaves = jax.tree.leaves(jax.tree.map(lambda x: np.asarray(x), state.params))
    ref = float(sum(np.abs(l).sum() for l in leaves))
    np.testing.assert_allclose(digests[0], ref, rtol=1e-6)


DP4_WORKER = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
from bayeslms_tpu.parallel.multihost import initialize_multihost

assert initialize_multihost()
assert jax.process_count() == 4, jax.process_count()
assert len(jax.devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("dp",))
pid = jax.process_index()
local = np.full((1, 4), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), local
)
with mesh:
    s = jax.shard_map(
        lambda x: jax.lax.psum(x.sum(), "dp"),
        mesh=mesh, in_specs=P("dp"), out_specs=P(),
    )(garr)
assert abs(float(s) - 40.0) < 1e-6, float(s)  # 4*(1+2+3+4)
print("MULTIHOST4_OK", pid, flush=True)
"""


TP_CROSS_WORKER = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
from bayeslms_tpu.parallel.multihost import initialize_multihost

assert initialize_multihost()
assert jax.process_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bayeslms_tpu import ModelConfig, TrainConfig
from bayeslms_tpu.data.corpus import batchify
from bayeslms_tpu.parallel.mesh import make_mesh
from bayeslms_tpu.train.loop import Trainer

# 4 global devices, ONE per process: every tp pair crosses a process
# boundary, so the vocab-sharded decoder/CE collectives ride DCN.
mesh = make_mesh(dp=2, tp=2)
cfg = ModelConfig(model="LSTM", vocab_size=32, emsize=8, nhid=8, dropout=0.0)
tcfg = TrainConfig(lr=0.5, batch_size=4, epochs=1, seq_len=8, seed=3,
                   rng_impl="threefry2x32")
trainer = Trainer(cfg, tcfg, mesh=mesh)
state = trainer.init_state()
stream = (np.arange(800) % 17 + 1).astype(np.int32)
rows = batchify(stream, tcfg.batch_size)
state = trainer.run_epoch(state, rows, jax.random.key(9, impl=tcfg.rng_impl),
                          log=lambda *a: None)

# params may be tp-sharded across processes: reduce ON DEVICE to a
# replicated scalar (fully addressable everywhere), then fetch
def digest_fn(params):
    leaves = jax.tree.leaves(
        jax.tree.map(lambda x: jnp.abs(x.astype(jnp.float32)).sum(), params))
    return sum(leaves)

dig = jax.jit(digest_fn, out_shardings=NamedSharding(mesh, P()))(state.params)
print("DIGEST %.10f" % float(dig), flush=True)
"""


def _launch(worker_src, n, timeout=600):
    port = _free_port()
    procs = []
    for pid in range(n):
        env = dict(os.environ)
        env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(n)
        env["JAX_PROCESS_ID"] = str(pid)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker_src], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
    return outs


def test_four_process_dp_mesh():
    """dp=4 over four jax.distributed processes (one device each): the
    cross-process psum sees every shard."""
    outs = _launch(DP4_WORKER, 4)
    for pid, (rc, out, err) in enumerate(outs):
        assert f"MULTIHOST4_OK {pid}" in out


def test_four_process_dp2_tp2_epoch_matches_single():
    """dp=2 x tp=2 over FOUR processes, one device each — every tensor-
    parallel pair crosses a process boundary, so the vocab-sharded
    decoder/fused-CE collectives run over DCN. The trained-params digest
    must agree across all four workers and with a single-process run of
    the identical dp2xtp2 geometry on local virtual devices."""
    import re

    import numpy as np

    # 4 JAX processes compile the GSPMD tp step serially on this host's one
    # core; generous timeout so contention doesn't flake the suite
    outs = _launch(TP_CROSS_WORKER, 4, timeout=1800)
    digests = [float(re.search(r"DIGEST ([0-9.]+)", out).group(1))
               for _, out, _ in outs]
    assert len(set(digests)) == 1, digests

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.data.corpus import batchify
    from bayeslms_tpu.parallel.mesh import make_mesh
    from bayeslms_tpu.train.loop import Trainer

    mesh = make_mesh(dp=2, tp=2)
    cfg = ModelConfig(model="LSTM", vocab_size=32, emsize=8, nhid=8,
                      dropout=0.0)
    tcfg = TrainConfig(lr=0.5, batch_size=4, epochs=1, seq_len=8, seed=3,
                       rng_impl="threefry2x32")
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    state = trainer.init_state()
    stream = (np.arange(800) % 17 + 1).astype(np.int32)
    rows = batchify(stream, tcfg.batch_size)
    state = trainer.run_epoch(state, rows,
                              jax.random.key(9, impl=tcfg.rng_impl),
                              log=lambda *a: None)

    def digest_fn(params):
        leaves = jax.tree.leaves(
            jax.tree.map(lambda x: jnp.abs(x.astype(jnp.float32)).sum(),
                         params))
        return sum(leaves)

    ref = float(jax.jit(digest_fn,
                        out_shardings=NamedSharding(mesh, P()))(state.params))
    np.testing.assert_allclose(digests[0], ref, rtol=1e-6)


def test_oversubscribed_mesh_rejected():
    """Unsupported process/device combinations fail fast with a clear
    error instead of hanging in collective setup."""
    import pytest

    from bayeslms_tpu.parallel.mesh import make_mesh

    with pytest.raises(AssertionError, match="available devices"):
        make_mesh(dp=5, tp=2)  # 10 > the 8 virtual CPU devices
