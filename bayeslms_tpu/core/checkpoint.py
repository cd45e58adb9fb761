"""Checkpointing + partial prior-load shim.

Reference semantics: best-validation ``torch.save(state_dict)``
(train.py:498-500) and *partial* state-dict merges for the
pretrain-then-finetune-from-prior workflow (train.py:239-258 — keys present
in both trees are overwritten, everything else keeps its fresh init; same
pattern in the scorer, compute_sentence_scores_bayes_jianwei.py:457-472).

Implementation: flax msgpack serialization for the param pytree plus a JSON
sidecar with the model config. ``partial_update`` merges by matching path AND
shape, replicating the filtered-update semantics.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def _atomic_write(path: str, data: bytes) -> None:
    # Write-temp-then-rename so a reader (e.g. the trainer's plateau
    # reload-best, reference train.py:505-512) never sees a torn file. The
    # temp name is unique per process so concurrent multihost writers on a
    # shared filesystem can't interleave; params are replicated across
    # processes, so last-rename-wins leaves identical bytes either way.
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(path: str, params, meta: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_params = jax.device_get(params)
    _atomic_write(path, serialization.to_bytes(host_params))
    if meta is not None:
        _atomic_write(path + ".json",
                      json.dumps(meta, indent=2, default=str).encode())


def load_checkpoint(path: str, target=None) -> Tuple[Any, Optional[dict]]:
    with open(path, "rb") as f:
        raw = f.read()
    if target is not None:
        params = serialization.from_bytes(target, raw)
    else:
        params = serialization.msgpack_restore(raw)
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return params, meta


def partial_update(params, prior_params) -> Tuple[Any, list]:
    """Overwrite every leaf of ``params`` that exists with the same path and
    shape in ``prior_params`` (reference train.py:246-258). Returns the
    merged tree and the list of updated paths."""
    flat = flatten_dict(params)
    prior_flat = flatten_dict(prior_params)
    updated = []
    for k, v in prior_flat.items():
        if k in flat and np.shape(flat[k]) == np.shape(v):
            flat[k] = np.asarray(v, dtype=np.asarray(flat[k]).dtype)
            updated.append("/".join(map(str, k)))
    return unflatten_dict(flat), updated


def import_torch_state_dict(state_dict: Dict[str, "np.ndarray"], cfg) -> dict:
    """Map a reference PyTorch state_dict onto this framework's param tree.

    Lets a user of the reference load their trained checkpoints directly
    (golden-parity tested in tests/test_torch_import.py). Covers the
    RNN-family containers (torch nn.LSTM/GRU/RNN and the Bayes(2)LSTM
    mean/lgstd naming) and the Transformer family (torch
    TransformerEncoderLayer in_proj/out_proj and the reference's self-built
    qkv_net/o_net/linear1/linear2/norms, plus BayesLinear and the EMB
    projection). Keys with no counterpart are skipped; compose with
    ``partial_update``.
    """
    import re

    out: Dict[tuple, np.ndarray] = {}

    def put(path: str, v):
        out[tuple(path.split("/"))] = np.asarray(v)

    for k, v in state_dict.items():
        v = np.asarray(v)
        if k == "encoder.weight":
            put("embedding", v)
        elif k == "decoder.weight":
            if not cfg.tied:
                put("decoder_w", v)
        elif k == "decoder.bias":
            put("decoder_b", v)
        elif k in ("embed_mean", "embed_lgstd"):  # EMB Bayes projection
            put(k, v)
        # ---- torch nn.LSTM/GRU/RNN (RNNModel): weight_ih_l<k> etc. (exact
        # match so Bayes "weight_hh_lgstd_1" doesn't collide with the
        # "weight_hh_l" prefix)
        elif re.fullmatch(r"rnn\.(weight|bias)_(ih|hh)_l(\d+)", k):
            mm = re.fullmatch(r"rnn\.(weight|bias)_(ih|hh)_l(\d+)", k)
            kind = "w" if mm.group(1) == "weight" else "b"
            put(f"core/l{mm.group(3)}_{kind}_{mm.group(2)}", v)
        # ---- Bayes2LSTM / BayesLSTM / GaussLSTM / legacy VLSTM means+lgstds
        elif k.startswith("rnn.") and ("_mean_" in k or "_lgstd_" in k):
            put(f"core/{k[len('rnn.'):]}", v)
        # ---- legacy GaussLSTM's bare GP unit (model.py:1379-1388)
        elif k.startswith("rnn.gpnn."):
            put(f"core/gpnn/{k[len('rnn.gpnn.'):]}", v)
        # ---- legacy VLSTM noise tables (model.py:2609-2613)
        elif re.fullmatch(r"rnn\.hiddens_(mean|lgstd)(_p)?", k):
            put(f"core/{k[len('rnn.'):]}", v)
        # ---- GPLSTM / VariationalLSTM stacks (GaussRNNModel model.py:1317-1366,
        # VariationalRNNModel :2373-2423): per-cell keys under rnn.rnn.<i>.
        elif re.match(r"rnn\.rnn\.(\d+)\.", k):
            mm = re.match(r"rnn\.rnn\.(\d+)\.(.*)", k)
            i, rest = mm.group(1), mm.group(2)
            if rest == "vnn.hidden_lgstd":
                put(f"core/l{i}_vnn/hidden_lgstd", v)
            elif rest == "gpnn.coef.weight":  # GPNN2 read-out Linear
                put(f"core/cell{i}/gpnn/coef_kernel", v.T)
            elif rest == "gpnn.coef.bias":
                put(f"core/cell{i}/gpnn/coef_bias", v)
            elif rest.startswith("gpnn."):
                put(f"core/cell{i}/gpnn/{rest[len('gpnn.'):]}", v)
            elif re.fullmatch(r"(weight|bias)_(ih|hh)_l0", rest):
                gm = re.fullmatch(r"(weight|bias)_(ih|hh)_l0", rest)
                kind = "w" if gm.group(1) == "weight" else "b"
                put(f"core/std{i}/l_{kind}_{gm.group(2)}", v)
            elif rest in ("weights_ih", "weights_hh", "bias_ih", "bias_hh"):
                # GP cell params in a Gaussian stack; flat VLSTMCell params
                # in a Variational one.
                if getattr(cfg, "uncertainty", None) == "Variational":
                    put(f"core/l{i}_{rest}", v)
                else:
                    put(f"core/cell{i}/{rest}", v)
        # ---- Transformer layers (both torch TransformerEncoder's
        # "transformerlayers.layers.N." and the self-built
        # "transformerlayers.N." prefixes)
        else:
            m = re.match(r"transformerlayers\.(?:layers\.)?(\d+)\.(.*)", k)
            if not m:
                continue
            i, rest = int(m.group(1)), m.group(2)
            base = f"layers_{i}"
            table = {
                "self_attn.in_proj_weight": (f"{base}/self_attn/qkv_net/kernel", True),
                "self_attn.in_proj_bias": (f"{base}/self_attn/qkv_net/bias", False),
                "qkv_net.weight": (f"{base}/self_attn/qkv_net/kernel", True),
                "qkv_net.bias": (f"{base}/self_attn/qkv_net/bias", False),
                "self_attn.qkv_net.weight": (f"{base}/self_attn/qkv_net/kernel", True),
                "self_attn.qkv_net.bias": (f"{base}/self_attn/qkv_net/bias", False),
                "self_attn.out_proj.weight": (f"{base}/self_attn/o_net/kernel", True),
                "self_attn.out_proj.bias": (f"{base}/self_attn/o_net/bias", False),
                "self_attn.o_net.weight": (f"{base}/self_attn/o_net/kernel", True),
                "self_attn.o_net.bias": (f"{base}/self_attn/o_net/bias", False),
                "self_attn.q_net.weight": (f"{base}/self_attn/q_net/kernel", True),
                "self_attn.q_net.bias": (f"{base}/self_attn/q_net/bias", False),
                "self_attn.k_net.weight": (f"{base}/self_attn/k_net/kernel", True),
                "self_attn.k_net.bias": (f"{base}/self_attn/k_net/bias", False),
                "self_attn.v_net.weight": (f"{base}/self_attn/v_net/kernel", True),
                "self_attn.v_net.bias": (f"{base}/self_attn/v_net/bias", False),
                "self_attn.o_net.weight_mean": (f"{base}/self_attn/o_net/weight_mean", False),
                "self_attn.o_net.weight_lgstd": (f"{base}/self_attn/o_net/weight_lgstd", False),
                "linear1.weight": (f"{base}/linear1/kernel", True),
                "linear1.bias": (f"{base}/linear1/bias", False),
                "linear2.weight": (f"{base}/linear2/kernel", True),
                "linear2.bias": (f"{base}/linear2/bias", False),
                "linear2.weight_mean": (f"{base}/linear2/weight_mean", False),
                "linear2.weight_lgstd": (f"{base}/linear2/weight_lgstd", False),
                "norm1.weight": (f"{base}/norm1/scale", False),
                "norm1.bias": (f"{base}/norm1/bias", False),
                "norm2.weight": (f"{base}/norm2/scale", False),
                "norm2.bias": (f"{base}/norm2/bias", False),
                "gpnn.weights_mean": (f"{base}/gpnn/weights_mean", False),
                "gpnn.weights_lgstd": (f"{base}/gpnn/weights_lgstd", False),
                "gpnn.bias_mean": (f"{base}/gpnn/bias_mean", False),
                "gpnn.bias_lgstd": (f"{base}/gpnn/bias_lgstd", False),
                "gpnn.coef_mean": (f"{base}/gpnn/coef_mean", False),
                "gpnn.coef_lgstd": (f"{base}/gpnn/coef_lgstd", False),
                "gpnn.frequency_mean": (f"{base}/gpnn/frequency_mean", False),
                "gpnn.frequency_lgstd": (f"{base}/gpnn/frequency_lgstd", False),
                "gpnn.coef.weight": (f"{base}/gpnn/coef_kernel", True),
                "gpnn.coef.bias": (f"{base}/gpnn/coef_bias", False),
                "hiddens_mean": (f"{base}/hiddens_mean", False),
                "hiddens_lgstd": (f"{base}/hiddens_lgstd", False),
                "hiddens_mean_p": (f"{base}/hiddens_mean_p", False),
                "hiddens_lgstd_p": (f"{base}/hiddens_lgstd_p", False),
            }
            if rest in table:
                path, transpose = table[rest]
                put(path, v.T if transpose else v)
    return unflatten_dict(out)


def load_torch_checkpoint(path: str, cfg) -> dict:
    """Load a torch .pt state_dict file and map it to this framework."""
    import torch

    with open(path, "rb") as f:
        sd = torch.load(f, map_location="cpu")
    return import_torch_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)


# ---------------------------------------------------------------- orbax
# Optional orbax backend: async, sharding-aware checkpointing for large /
# multi-host runs (the msgpack path above stays the default for parity with
# the reference's single-file torch.save workflow).

def save_checkpoint_orbax(path: str, params) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), jax.device_get(params), force=True)


def load_checkpoint_orbax(path: str, target=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(os.path.abspath(path), target=target)
        return ckptr.restore(os.path.abspath(path))
