"""Batched, jitted N-best scorer.

Replaces the reference's throughput bottleneck — a per-hypothesis, batch-1,
H2D-per-hyp python loop (compute_sentence_scores_bayes_jianwei.py:237-274) —
with padded, length-bucketed batches scored end-to-end under jit:

- Per-hypothesis score = SUM of token cross-entropies over the true tokens
  (identical to the reference's ``len * mean_CE``, :170).
- Logit-level interpolation ``alpha*out1 + (1-alpha)*out2`` with a baseline
  model (inter_flag=1, :157-163) and score-level interpolation
  (inter_flag=2, `…copy.py`:244-264) both supported.
- LSTM cross-utterance carry-over (:261-274) is EXACT: every hypothesis of an
  utterance starts from the hidden state of the previous utterance's first
  hypothesis; the step_mask machinery returns states at true lengths, so the
  whole utterance scores as ONE (T_bucket, N) batch and the carry chain stays
  bit-faithful while utterances remain serial.
- Transformer (or carry_over=False): all hypotheses from all utterances are
  globally length-bucketed into (T_bucket, batch) batches — embarrassingly
  parallel, maximal MXU occupancy.

Scoring runs at the posterior mean (deterministic=True), matching the
reference's eval-mode semantics (model.py:441,459,1084).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import ModelConfig, RescoreConfig
from ..core.registry import build_model
from ..models.lstm_lm import init_hidden
from .nbest import bucket_for, encode_hyp, length_buckets, pad_batch


def _masked_ce_sums(logits, targets, mask):
    """Per-column sum of token CE over real tokens: (T,B,V) -> (B,)."""
    V = logits.shape[-1]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, V), targets.reshape(-1)
    ).reshape(targets.shape)
    return (ce * mask).sum(axis=0)


class BatchScorer:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        rcfg: RescoreConfig,
        cfg2: Optional[ModelConfig] = None,
        params2=None,
    ):
        self.cfg = cfg
        self.rcfg = rcfg
        self.model = build_model(cfg)
        self.params = params
        self.interp = rcfg.inter_flag
        if self.interp:
            assert params2 is not None, "interpolation needs a second model"
            self.model2 = build_model(cfg2 or cfg)
            self.params2 = params2
        self.is_tm = cfg.is_transformer
        self._tm_step = jax.jit(self._tm_impl)
        self._rnn_step = jax.jit(self._rnn_impl)

    # ------------------------------------------------------------ jit bodies
    def _tm_impl(self, params, params2, data, tgt, mask):
        logits = self.model.apply({"params": params}, data, deterministic=True)
        if self.interp == 1:
            logits2 = self.model2.apply({"params": params2}, data, deterministic=True)
            a = self.rcfg.inter_alpha
            logits = a * logits + (1.0 - a) * logits2
            return _masked_ce_sums(logits, tgt, mask)
        if self.interp == 2:
            logits2 = self.model2.apply({"params": params2}, data, deterministic=True)
            a = self.rcfg.inter_alpha
            return a * _masked_ce_sums(logits, tgt, mask) + (1.0 - a) * _masked_ce_sums(
                logits2, tgt, mask
            )
        return _masked_ce_sums(logits, tgt, mask)

    def _rnn_impl(self, params, params2, data, tgt, mask, h1, h2):
        logits, new_h1 = self.model.apply(
            {"params": params}, data, h1, deterministic=True, step_mask=mask
        )
        new_h2 = h2
        if self.interp == 1:
            logits2, new_h2 = self.model2.apply(
                {"params": params2}, data, h2, deterministic=True, step_mask=mask
            )
            a = self.rcfg.inter_alpha
            logits = a * logits + (1.0 - a) * logits2
            scores = _masked_ce_sums(logits, tgt, mask)
        elif self.interp == 2:
            logits2, new_h2 = self.model2.apply(
                {"params": params2}, data, h2, deterministic=True, step_mask=mask
            )
            a = self.rcfg.inter_alpha
            scores = a * _masked_ce_sums(logits, tgt, mask) + (
                1.0 - a
            ) * _masked_ce_sums(logits2, tgt, mask)
        else:
            scores = _masked_ce_sums(logits, tgt, mask)
        return scores, new_h1, new_h2

    # ------------------------------------------------------------ public API
    def score_nbest(self, nbest: "OrderedDict[str, List[str]]", word2idx: Dict[str, int]):
        if self.is_tm or not self.rcfg.carry_over:
            return self._score_bucketed(nbest, word2idx)
        return self._score_carry(nbest, word2idx)

    # -- global length-bucketed batching (transformer / no carry-over)
    def _score_bucketed(self, nbest, word2idx):
        rc = self.rcfg
        items = []  # (key, idx, in_ids, tgt_ids)
        for key, hyps in nbest.items():
            for i, hyp in enumerate(hyps):
                x, y = encode_hyp(hyp, word2idx)
                items.append((key, i, x, y))
        buckets = length_buckets(rc.max_hyp_len)
        by_bucket: Dict[int, list] = {}
        for it in items:
            by_bucket.setdefault(bucket_for(len(it[2]), buckets), []).append(it)

        scores: Dict[tuple, float] = {}
        p2 = self.params2 if self.interp else self.params
        for T, group in sorted(by_bucket.items()):
            Bc = rc.batch_size
            for s in range(0, len(group), Bc):
                chunk = group[s : s + Bc]
                data, tgt, mask, _ = pad_batch(
                    [c[2] for c in chunk], [c[3] for c in chunk], T, Bc
                )
                if self.is_tm:
                    out = self._tm_step(
                        self.params, p2, jnp.asarray(data), jnp.asarray(tgt), jnp.asarray(mask)
                    )
                else:
                    h = init_hidden(self.cfg.nlayers, Bc, self.cfg.nhid)
                    out, _, _ = self._rnn_step(
                        self.params, p2, jnp.asarray(data), jnp.asarray(tgt),
                        jnp.asarray(mask), h, h,
                    )
                out = np.asarray(out)
                for j, (key, i, _, _) in enumerate(chunk):
                    scores[(key, i)] = float(out[j])

        return self._assemble(nbest, scores)

    # -- serial utterances, batched hypotheses (exact carry-over)
    def _score_carry(self, nbest, word2idx):
        rc = self.rcfg
        buckets = length_buckets(rc.max_hyp_len)
        N = max((len(h) for h in nbest.values()), default=1)
        p2 = self.params2 if self.interp else self.params
        carry1 = init_hidden(self.cfg.nlayers, 1, self.cfg.nhid)
        carry2 = init_hidden(self.cfg.nlayers, 1, self.cfg.nhid)
        scores: Dict[tuple, float] = {}

        for key, hyps in nbest.items():
            enc = [encode_hyp(h, word2idx) for h in hyps]
            T = bucket_for(max(len(x) for x, _ in enc), buckets)
            data, tgt, mask, _ = pad_batch([x for x, _ in enc], [y for _, y in enc], T, N)
            # every hypothesis starts from the carried state (ref :237-259)
            h1 = jax.tree.map(lambda a: jnp.broadcast_to(a, (a.shape[0], N, a.shape[2])), carry1)
            h2 = jax.tree.map(lambda a: jnp.broadcast_to(a, (a.shape[0], N, a.shape[2])), carry2)
            out, new_h1, new_h2 = self._rnn_step(
                self.params, p2, jnp.asarray(data), jnp.asarray(tgt), jnp.asarray(mask),
                h1, h2,
            )
            out = np.asarray(out)
            for i in range(len(hyps)):
                scores[(key, i)] = float(out[i])
            # carry the FIRST hypothesis's final state (ref :261-274)
            carry1 = jax.tree.map(lambda a: a[:, 0:1], new_h1)
            carry2 = jax.tree.map(lambda a: a[:, 0:1], new_h2)

        return self._assemble(nbest, scores)

    @staticmethod
    def _assemble(nbest, scores):
        out = OrderedDict()
        for key, hyps in nbest.items():
            out[key] = [(hyp, scores[(key, i)]) for i, hyp in enumerate(hyps)]
        return out
