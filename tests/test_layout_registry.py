"""The scoring-layout dispatch registry is the single source of truth.

Enumerates `bayeslms_tpu.rescore.layouts.LAYOUTS` and pins which layout
each scorer configuration selects, so adding a layout (or changing a
selection gate) without updating the registry — or leaving a registry
entry no configuration can reach — fails here instead of silently
rerouting configs to a different implementation.
"""

from collections import OrderedDict

import numpy as np
import pytest

from bayeslms_tpu import ModelConfig, RescoreConfig, build_model, init_params
from bayeslms_tpu.rescore import layouts
from bayeslms_tpu.rescore.scorer import BatchScorer

V = 32
LSTM = dict(model="LSTM", vocab_size=V, emsize=8, nhid=8, dropout=0.0)
TM = dict(model="Transformer", vocab_size=V, emsize=8, nhid=16, nlayers=2,
          nhead=2, dropout=0.0)


def _scorer(cfg_kw, rcfg_kw, fused=False):
    cfg = ModelConfig(**cfg_kw)
    params = init_params(build_model(cfg), cfg)
    rcfg = RescoreConfig(max_hyp_len=16, batch_size=4, **rcfg_kw)
    s = BatchScorer(cfg, params, rcfg)
    if fused:
        # the packed parity tests' convention for exercising the fused
        # gates on CPU: force the flag after construction (the pallas
        # kernel itself runs in interpret mode, see _fused_on)
        s.use_fused_ce = True
    return s


def _fused_on(monkeypatch):
    """Run the fused-CE pallas kernel in interpret mode on CPU, like the
    packed parity tests do — the packed layouts require it."""
    from bayeslms_tpu.ops import ce_pallas as cp

    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_BM", 8)
    monkeypatch.setattr(cp, "_BV", 128)


def test_registry_names_are_pinned():
    assert [l.name for l in layouts.LAYOUTS] == [
        "xl", "packed-carry", "slotted-carry",
        "packed-nocarry", "slotted-bucketed",
    ]


# The selection matrix: (label, cfg, rcfg, needs_fused, expected layout).
MATRIX = [
    ("lstm carry, fused", LSTM, dict(carry_over=True), True, "packed-carry"),
    ("lstm carry, fused off", LSTM, dict(carry_over=True), False,
     "slotted-carry"),
    ("lstm no-carry, fused", LSTM, dict(carry_over=False), True,
     "packed-nocarry"),
    ("lstm no-carry, fused off", LSTM, dict(carry_over=False), False,
     "slotted-bucketed"),
    ("tm, fused", TM, dict(carry_over=False), True, "packed-nocarry"),
    ("tm, fused off", TM, dict(carry_over=False), False, "slotted-bucketed"),
    ("tm xl", TM, dict(carry_over=False, xl_mems=True), True, "xl"),
    ("tm mc", TM, dict(carry_over=False, mc_samples=2), True,
     "slotted-bucketed"),
]


@pytest.mark.parametrize("label,cfg_kw,rcfg_kw,fused,expect",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_selection_matrix(monkeypatch, label, cfg_kw, rcfg_kw, fused, expect):
    if fused:
        _fused_on(monkeypatch)
    else:
        monkeypatch.setenv("BAYESLM_FUSED_CE", "0")
    s = _scorer(cfg_kw, rcfg_kw, fused=fused)
    assert layouts.select(s).name == expect


def test_every_layout_is_reachable(monkeypatch):
    """No dead registry entries: each layout is selected by at least one
    configuration in the matrix above."""
    _fused_on(monkeypatch)
    selected = set()
    for label, cfg_kw, rcfg_kw, fused, expect in MATRIX:
        selected.add(expect)
    assert selected == {l.name for l in layouts.LAYOUTS}


def test_env_optouts_reroute_to_slotted(monkeypatch):
    _fused_on(monkeypatch)
    monkeypatch.setenv("BAYESLM_PACKED_CARRY", "0")
    s = _scorer(LSTM, dict(carry_over=True), fused=True)
    assert layouts.select(s).name == "slotted-carry"
    monkeypatch.setenv("BAYESLM_PACKED_TM", "0")
    s = _scorer(TM, dict(carry_over=False), fused=True)
    assert layouts.select(s).name == "slotted-bucketed"
    monkeypatch.setenv("BAYESLM_PACKED_NOCARRY", "0")
    s = _scorer(LSTM, dict(carry_over=False), fused=True)
    assert layouts.select(s).name == "slotted-bucketed"


def test_cross_family_interp_falls_back_to_slotted(monkeypatch):
    """An LSTM main model interpolated with a Transformer second model
    cannot ride the packed-carry layout (the fused interp identity needs
    same-family pairs) — the registry must route it to slotted-carry."""
    _fused_on(monkeypatch)
    cfg = ModelConfig(**LSTM)
    params = init_params(build_model(cfg), cfg)
    cfg2 = ModelConfig(**TM)
    params2 = init_params(build_model(cfg2), cfg2)
    rcfg = RescoreConfig(max_hyp_len=16, batch_size=4, carry_over=True,
                         inter_flag=2, inter_alpha=0.8)
    s = BatchScorer(cfg, params, rcfg, cfg2=cfg2, params2=params2)
    # even with the fused flag forced, the cross-family pair blocks packed
    s.use_fused_ce = True
    assert layouts.select(s).name == "slotted-carry"


def test_selected_layout_actually_scores(monkeypatch):
    """Smoke: dispatch through the registry produces scores for every
    hypothesis (packed-carry path, the most intricate layout)."""
    _fused_on(monkeypatch)
    s = _scorer(LSTM, dict(carry_over=True), fused=True)
    w2i = {"<s>": 1, "<unk>": 0}
    for i in range(2, V):
        w2i[f"w{i}"] = i
    rng = np.random.default_rng(0)
    nbest = OrderedDict(
        (f"u{j}", [" ".join(f"w{rng.integers(2, V)}"
                            for _ in range(rng.integers(2, 8)))
                   for _ in range(2)])
        for j in range(3)
    )
    assert layouts.select(s).name == "packed-carry"
    out = s.score_nbest(nbest, w2i)
    assert set(out) == set(nbest)
    for k in nbest:
        assert len(out[k]) == len(nbest[k])
        assert all(np.isfinite(sc) for _, sc in out[k])
