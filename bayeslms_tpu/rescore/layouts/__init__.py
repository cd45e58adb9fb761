"""Scoring-layout registry.

Every way a BatchScorer can arrange hypotheses on the device is a
LAYOUT: a name, a selection predicate over the scorer's configuration,
and a score function ``fn(scorer, nbest, word2idx, stream_fn, enc_all)``.
`select(scorer)` walks the table in order and returns the first match —
the table IS the dispatch logic, and tests/test_layout_registry.py
enumerates it so a new layout (or a gate change) that isn't reflected
here fails the suite instead of silently rerouting configs.

Order encodes preference: packed layouts outperform their slotted
fallbacks (~2-3x fewer recurrence steps / no bucket padding) and are
chosen whenever their gates allow; the slotted paths remain the
CPU/XLA/MC/cross-family fallback and the parity yardstick the packed
layouts are tested against.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from . import packed, slotted, xl


class Layout(NamedTuple):
    name: str
    when: Callable  # predicate over the scorer
    fn: Callable    # fn(scorer, nbest, word2idx, stream_fn, enc_all)


LAYOUTS = (
    # Transformer-XL segment memories force their own serial layout
    # (init rejects xl_mems for non-TM / interp / MC configs).
    Layout("xl", lambda s: s.is_tm and s.rcfg.xl_mems, xl.score_xl),
    # Recurrent carry-over: packed-time when the gates allow, else
    # per-utterance slots.
    Layout("packed-carry",
           lambda s: not s.is_tm and s.rcfg.carry_over
           and packed.carry_allowed(s),
           packed.score_carry_packed),
    Layout("slotted-carry",
           lambda s: not s.is_tm and s.rcfg.carry_over,
           slotted.score_carry),
    # Independent hypotheses (TM always; RNN with carry_over=False):
    # bin-packed columns when the gates allow, else length buckets.
    Layout("packed-nocarry",
           lambda s: packed.nocarry_allowed(s),
           packed.score_packed_nocarry),
    Layout("slotted-bucketed", lambda s: True, slotted.score_bucketed),
)


def select(scorer) -> Layout:
    for layout in LAYOUTS:
        if layout.when(scorer):
            return layout
    raise AssertionError("unreachable: slotted-bucketed matches all")
