"""GP-family FLOP accounting (tools/tpu_train_bench.py gp_flops_delta).

Pins the replacement-vs-additive classification: GPNN types 0-3 replace a
same-shape matmul (delta 0 — the benched MFU rows are exact), while
cat(x,h) gate units, the cell transform, and GPNN2 random features add
real matmuls.
"""

import importlib.util
import os

from bayeslms_tpu import ModelConfig

spec = importlib.util.spec_from_file_location(
    "ttb", os.path.join(os.path.dirname(__file__), "..", "tools",
                        "tpu_train_bench.py"))
ttb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ttb)

V, E, H = 1000, 64, 64


def _lstm(pos):
    return ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H,
                       uncertainty="Gaussian", l_gauss_pos=pos)


def _tm(pos):
    return ModelConfig(model="Transformer", vocab_size=V, emsize=E, nhid=4 * E,
                       nlayers=2, nhead=2, uncertainty="Gaussian",
                       t_gauss_pos=pos)


def test_replacement_units_are_zero_delta():
    # gates 6/7 replace the same-shape hidden/input projection
    assert ttb.gp_flops_delta(_lstm("63")) == 0
    assert ttb.gp_flops_delta(_lstm("73")) == 0
    # GPNN type <=3 replaces the TM FFN's linear1
    for p in (1, 2, 3):
        assert ttb.gp_flops_delta(_tm(p)) == 0
    # non-GP families never contribute
    assert ttb.gp_flops_delta(
        ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H,
                    uncertainty="Bayesian", l_bayes_pos=3)) == 0


def test_additive_units_count():
    # cat(x,h) gate over layer 1: +2*H*(E+H) per token
    assert ttb.gp_flops_delta(_lstm("13")) == 2 * H * (E + H)
    # len-3: standard layer then GP cell (in = H)
    assert ttb.gp_flops_delta(_lstm("133")) == 2 * H * (H + H)
    # len-4: GP cells in both layers (digit2 = second gate)
    assert ttb.gp_flops_delta(_lstm("3133")) == 2 * H * (E + H) + 2 * H * (H + H)
    # gate 5: cell transform H->H
    assert ttb.gp_flops_delta(_lstm("53")) == 2 * H * H
    # GPNN2 on a gate value: random features + readout
    assert ttb.gp_flops_delta(_lstm("14")) == 2 * (H * 150 + 150 * H)
    # TM type 4: GPNN2 replaces linear1 (E -> 4E): freq+readout minus E*4E
    assert ttb.gp_flops_delta(_tm(4)) == 2 * (E * 150 + 150 * 4 * E) - 2 * E * 4 * E


def test_train_flops_include_delta():
    base = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H)
    gp = _lstm("13")
    T, B = 10, 4
    assert (ttb.train_flops_per_step(gp, T, B)
            - ttb.train_flops_per_step(base, T, B)
            ) == 3 * T * B * 2 * H * (E + H)
