"""Device mesh + sharding rules.

The reference has NO distributed backend (SURVEY.md §2c — single process,
single V100, plus an nj=5 process array for rescoring). Here parallelism is
first-class SPMD over an ICI mesh:

- axis ``dp``: data parallel — the batch dimension is sharded; XLA inserts
  the gradient all-reduce.
- axis ``tp``: tensor parallel — vocab-sharded embedding/decoder and
  FFN/gate-sharded weight matrices; XLA's GSPMD propagates the shardings and
  inserts all-gathers/reduce-scatters over ICI.

Rules are path-based so every model in the zoo (LSTM gate blocks, Bayesian
mean/lgstd pairs, GP units, transformer FFN/qkv) shards consistently: any
parameter whose trailing structure matches a rule gets its named axes; means
and lgstds of the same tensor shard identically so sampled perturbations stay
local to a shard.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if dp is None:
        dp = n // tp
    need = dp * tp
    assert need <= n, f"dp*tp={need} > {n} available devices"
    arr = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# ---------------------------------------------------------------- rules

def param_spec(path: Tuple[str, ...], shape: Tuple[int, ...], tp: int) -> P:
    """PartitionSpec for one parameter.

    Sharding policy (only applied when the dimension divides evenly):
    - embedding / decoder_w (V, E): vocab-sharded over tp
    - decoder_b (V,): vocab-sharded
    - transformer FFN / qkv kernels: output-feature sharded (axis -1),
      second linear input-sharded (axis 0) so the pair forms the classic
      Megatron column/row split with a single reduce per block
    - LSTM gate blocks (4H, in): gate-row sharded over tp
    - everything else replicated
    """
    name = path[-1]
    joined = "/".join(path)

    def ok(dim):
        return dim % tp == 0 and tp > 1

    if name in ("embedding", "decoder_w", "decoder_b"):
        return P("tp") if ok(shape[0]) else P()
    if "linear1" in joined or "qkv_net" in joined or "q_net" in joined or (
        "k_net" in joined or "v_net" in joined
    ):
        if name == "kernel" and len(shape) == 2 and ok(shape[1]):
            return P(None, "tp")
        if name == "bias" and ok(shape[0]):
            return P("tp")
        return P()
    if "linear2" in joined or "o_net" in joined:
        if name == "kernel" and len(shape) == 2 and ok(shape[0]):
            return P("tp", None)
        if name in ("weight_mean", "weight_lgstd") and len(shape) == 2 and ok(shape[1]):
            return P(None, "tp")  # BayesDense stores (out, in); in = ff axis
        return P()
    if ("w_ih" in name or "w_hh" in name or "weight_ih" in name or "weight_hh" in name
            or "weights_ih" in name or "weights_hh" in name):
        if len(shape) == 2 and ok(shape[0]):
            return P("tp", None)
        return P()
    if ("b_ih" in name or "b_hh" in name or "bias_ih" in name or "bias_hh" in name):
        if ok(shape[0]):
            return P("tp")
        return P()
    return P()


def params_shardings(mesh: Mesh, params):
    """NamedSharding pytree mirroring ``params`` via the path rules."""
    tp = mesh.shape.get("tp", 1)  # user meshes may be dp-only

    def spec_for(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return NamedSharding(mesh, param_spec(keys, np.shape(leaf), tp))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(T, B) token batches: shard the batch dimension over dp."""
    return NamedSharding(mesh, P(None, "dp"))


def hidden_sharding(mesh: Mesh) -> NamedSharding:
    """(nlayers, B, H) hidden states: shard batch over dp."""
    return NamedSharding(mesh, P(None, "dp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
