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


def save_checkpoint(path: str, params, meta: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_params))
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


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

    Supports the standard and Bayesian containers (the parity-test surface).
    Keys that have no counterpart are skipped; use together with
    ``partial_update``.
    """
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
        # torch nn.LSTM/GRU/RNN (RNNModel)
        elif k.startswith("rnn.weight_ih_l"):
            put(f"core/l{k[-1]}_w_ih", v)
        elif k.startswith("rnn.weight_hh_l"):
            put(f"core/l{k[-1]}_w_hh", v)
        elif k.startswith("rnn.bias_ih_l"):
            put(f"core/l{k[-1]}_b_ih", v)
        elif k.startswith("rnn.bias_hh_l"):
            put(f"core/l{k[-1]}_b_hh", v)
        # Bayes2LSTM / BayesLSTM means and lgstds (keep reference names)
        elif k.startswith("rnn.") and ("_mean_" in k or "_lgstd_" in k):
            put(f"core/{k[len('rnn.'):]}", v)
    return unflatten_dict(out)
