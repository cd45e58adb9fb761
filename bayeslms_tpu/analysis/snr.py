"""Posterior signal-to-noise analysis.

Reference: variance.py — for a trained Bayesian checkpoint, SNR =
|posterior mean| / softplus(lgstd) over the sampled gate slice
(variance.py:37-57: sigma = log(exp(lgstd)+1), mean = |mean[rows of the
Bayesian gate position]|), reported as the median. Generalized here to every
(mean, lgstd) pair in a checkpoint, with the gate-slice selection applied
for the LSTM cores.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.checkpoint import load_checkpoint
from ..core.config import ModelConfig
from flax.traverse_util import flatten_dict


def softplus(x):
    return np.log1p(np.exp(x))


def snr_report(params, cfg: Optional[ModelConfig] = None) -> Dict[str, dict]:
    """Median/mean SNR for every mean/lgstd parameter pair."""
    flat = {"/".join(map(str, k)): np.asarray(v) for k, v in flatten_dict(params).items()}
    report = {}
    for name, lgstd in flat.items():
        if "lgstd" not in name:
            continue
        mean_name = name.replace("lgstd", "mean")
        if mean_name not in flat:
            continue
        mean = flat[mean_name]
        # Bayesian LSTM gate-slice: the lgstd covers rows
        # [(pos-1)*H, pos*H) of the gate-blocked mean (variance.py:47-49).
        if cfg is not None and mean.shape != lgstd.shape:
            H = cfg.nhid
            pos = cfg.l_bayes_pos
            if 1 <= pos <= 4 and mean.shape[0] == 4 * H and lgstd.shape[0] == H:
                mean = mean[(pos - 1) * H : pos * H]
        if mean.shape != lgstd.shape:
            continue
        snr = np.abs(mean) / softplus(lgstd)
        report[name] = {
            "median_snr": float(np.median(snr)),
            "mean_snr": float(np.mean(snr)),
            "mean_sigma": float(np.mean(softplus(lgstd))),
            "shape": list(lgstd.shape),
        }
    return report


def snr_from_checkpoint(path: str, cfg: Optional[ModelConfig] = None):
    params, _ = load_checkpoint(path)
    return snr_report(params, cfg)
