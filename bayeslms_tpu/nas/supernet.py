"""DARTS supernets: deterministic-vs-stochastic branch search.

Re-design of the reference NAS models (model_search_bayes.py):

- ``differentiable_gumble_sample`` (:25-30): softmax((logits + Gumbel)/T),
  temperature 5.
- Transformer supernets (:33-333): per layer, the FFN is a weighted blend of
  a standard branch and a Bayesian (BayesDense linear2) or GP (GPNN) branch;
  arch weights shape (nlayers, 1, 2).
- LSTM supernets (:416-787): per gate, a blend of the standard gate
  pre-activation and a Bayesian/GP branch; arch weights (nlayers, 4, 2).

Architecture weights are NOT module params — they are an explicit argument,
so the Architect owns them as a separate pytree with its own optimizer (the
functional analogue of the reference's two optimizers over disjoint
parameter groups, train_search_bayes.py:200-212).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..models import initializers as tinit
from ..models.layers import GPNN, BayesDense
from ..models.lstm_lm import Hidden, _layer_params, _rnn_param_init
from ..models.transformer_lm import MultiheadSelfAttention
from ..ops import gaussian
from ..ops.attention import causal_mask, sinusoidal_positional_encoding


def gumbel_softmax(logits, key, temperature: float = 5.0):
    """softmax((logits + G)/T), G ~ Gumbel(0,1) (model_search_bayes.py:25-30)."""
    g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def init_arch_weights(key, nlayers: int, slots: int = 1, branches: int = 2):
    """Small random logits (reference: 1e-3 * randn)."""
    return 1e-3 * jax.random.normal(key, (nlayers, slots, branches))


class SearchEncoderLayer(nn.Module):
    """Encoder layer whose FFN blends standard + stochastic branches.

    mode='bayes': branch1 linear2 is a BayesDense (BayesTransSearchEncoderLayer,
    model_search_bayes.py:33-100). mode='gauss': branch1 is a GPNN FFN
    (GaussTransSearchEncoderLayer, :197-267).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    mode: str = "bayes"

    def setup(self):
        d, ff = self.d_model, self.dim_feedforward
        self.self_attn = MultiheadSelfAttention(d, self.nhead, self.dropout)
        self.linear1 = nn.Dense(
            ff, kernel_init=tinit.torch_linear_weight(d), bias_init=tinit.torch_linear_bias(d)
        )
        self.linear2 = nn.Dense(
            d, kernel_init=tinit.torch_linear_weight(ff), bias_init=tinit.torch_linear_bias(ff)
        )
        if self.mode == "bayes":
            # XLA sampling path: the unrolled second-order architect takes
            # grad-of-grad through this branch, which the fused bayes_matmul
            # custom VJP (pallas) cannot provide
            self.branch = BayesDense(ff, d, use_fused=False)
        else:
            self.branch = GPNN(
                d, ff, act_set=("tanh", "sigmoid", "relu", "gelu"), gpnn_type=3,
                sample_enabled=True,
            )
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, src, weights, attn_mask=None, deterministic: bool = True):
        """weights: (2,) blend of [standard, stochastic] branch outputs."""
        src2 = self.self_attn(src, attn_mask, deterministic)
        src = self.norm1(src + self.drop(src2, deterministic=deterministic))
        if self.mode == "bayes":
            mid = self.drop(
                jax.nn.gelu(self.linear1(src), approximate=False),
                deterministic=deterministic,
            )
            std_out = self.linear2(mid)
            sto_out = self.branch(mid, deterministic=deterministic)
            src2 = weights[0] * std_out + weights[1] * sto_out
        else:
            # GaussTransSearchEncoderLayer blends at the MID level — the
            # GPNN replaces linear1+activation, then ONE dropout + the
            # shared linear2 see the blended activations
            # (model_search_bayes.py:235-238)
            gp = self.branch(src, deterministic=deterministic)
            mid_blend = weights[0] * jax.nn.gelu(
                self.linear1(src), approximate=False) + weights[1] * gp
            src2 = self.linear2(self.drop(mid_blend, deterministic=deterministic))
        src = self.norm2(src + self.drop(src2, deterministic=deterministic))
        return src

    def branch_kl(self):
        return self.branch.kl()


class TransformerSupernet(nn.Module):
    """Searchable transformer LM (BayesTransModelSearch /
    GaussTransModelSearch, model_search_bayes.py:103-194, :270-333)."""

    cfg: ModelConfig
    mode: str = "bayes"  # bayes | gauss

    def setup(self):
        cfg = self.cfg
        self.embedding = self.param("embedding", tinit.uniform(0.1), (cfg.vocab_size, cfg.emsize))
        self.decoder_b = self.param("decoder_b", tinit.zeros(), (cfg.vocab_size,))
        self.pe = sinusoidal_positional_encoding(5000, cfg.emsize)
        self.drop = nn.Dropout(cfg.dropout)
        self.layers = [
            SearchEncoderLayer(cfg.emsize, cfg.nhead, cfg.nhid, cfg.dropout, self.mode)
            for _ in range(cfg.nlayers)
        ]

    def __call__(self, tokens, arch_weights, deterministic: bool = True,
                 gumbel_key=None, temperature: float = 5.0):
        """arch_weights: (nlayers, 1, 2) logits; sampled per forward."""
        cfg = self.cfg
        T = tokens.shape[0]
        # Explicit mask deliberately pins the differentiable einsum attention
        # path (ops/attention.py masking contract): the architect's unrolled
        # second-order step differentiates through this forward twice, and
        # the flash-train custom VJP has no JVP rule.
        mask = causal_mask(T)
        if gumbel_key is None:
            w = jax.nn.softmax(arch_weights, axis=-1)
        else:
            w = gumbel_softmax(arch_weights, gumbel_key, temperature)
        x = jnp.take(self.embedding, tokens, axis=0) * math.sqrt(cfg.emsize)
        x = self.drop(x + self.pe[:T, None, :], deterministic=deterministic)
        for l, layer in enumerate(self.layers):
            x = layer(x, w[l, 0], mask, deterministic)
            # UNWEIGHTED branch KL: the reference adds every layer's
            # gpnn.kl_divergence() regardless of arch weights
            # (train_search_bayes.py:289-293, recipe default T_bayes_pos=FFN)
            self.sow("losses", "kl", layer.branch_kl())
        logits = x @ self.embedding.T + self.decoder_b
        return logits


class LSTMSearchCell(nn.Module):
    """One LSTM layer with per-gate standard-vs-stochastic branch blending.

    BayesLSTMSearchCell (model_search_bayes.py:532-787): for each gate g, the
    pre-activation blends the standard slice with a Bayesian (sampled-weight)
    branch over cat(x, h); GPLSTMSearchCell (:416-529) uses GPNN branches.
    """

    input_size: int
    hidden_size: int
    mode: str = "bayes"

    def setup(self):
        H, IN = self.hidden_size, self.input_size
        init = _rnn_param_init(H)
        self.w_ih = self.param("w_ih", init, (4 * H, IN))
        self.w_hh = self.param("w_hh", init, (4 * H, H))
        self.b_ih = self.param("b_ih", tinit.zeros(), (4 * H,))
        self.b_hh = self.param("b_hh", tinit.zeros(), (4 * H,))
        if self.mode == "bayes":
            # per-gate ``Bayes`` branch modules (model_search_bayes.py:790-853)
            # stored as concatenated [in, forget, cell, out] row blocks; each
            # has weight AND bias posteriors (bias_mean inits to zero)
            stdv = 1.0 / math.sqrt(H)
            self.br_mean = self.param("branch_mean", init, (4 * H, IN + H))
            self.br_lgstd = self.param("branch_lgstd", gaussian.lgstd_init(stdv), (4 * H, IN + H))
            self.br_bias_mean = self.param("branch_bias_mean", tinit.zeros(), (4 * H,))
            self.br_bias_lgstd = self.param(
                "branch_bias_lgstd", gaussian.lgstd_init(stdv), (4 * H,))
        else:
            self.branches = [
                GPNN(IN + H, H,
                     act_set=("sigmoid", "tanh", "relu"), gpnn_type=3, sample_enabled=True,
                     name=f"gpnn{g}")
                for g in range(4)
            ]

    def __call__(self, x, hc, gate_w, deterministic: bool = True):
        """x: (T,B,IN); gate_w: (4, 2) branch weights per gate."""
        T, B, _ = x.shape
        H = self.hidden_size
        dtype = x.dtype
        xg = x.reshape(T * B, -1) @ self.w_ih.T.astype(dtype) + self.b_ih.astype(dtype)
        xg = xg.reshape(T, B, 4 * H)
        w_hh_t = self.w_hh.T.astype(dtype)

        if self.mode == "bayes":
            # The reference's search forward runs at the POSTERIOR MEAN: the
            # train loop flips `.sample = True` only AFTER the forward
            # (train_search_bayes.py:271-278), so the flag ever only gates
            # kl_divergence(); Bayes.forward's sampled-weight branch is dead
            # during search. Branch bias included (F.linear(inputs, w, b)).
            w_br = self.br_mean
            wx, wh = w_br[:, : self.input_size], w_br[:, self.input_size :]
            br_xg = (
                x.reshape(T * B, -1) @ wx.T.astype(dtype)
                + self.br_bias_mean.astype(dtype)
            ).reshape(T, B, 4 * H)
            gp = None
        else:
            # GP branches over cat(x, h): hoist the x-part of each gate's GP
            # pre-activation (one sample per sequence, like GPLSTMCell)
            gp = []
            for b in self.branches:
                w_, b_, coef = b.draw(deterministic)
                w_x, w_h = w_[:, : self.input_size], w_[:, self.input_size :]
                pre_x = (
                    x.reshape(T * B, -1) @ w_x.T.astype(dtype) + b_.astype(dtype)
                ).reshape(T, B, H)
                gp.append((pre_x, w_h, coef, b.act_set))
            br_xg = jnp.concatenate([g[0] for g in gp], axis=-1)  # (T, B, 4H)
            wh = None

        def step(carry, inp):
            h, c = carry
            xg_t, brx_t = inp
            # bias quirk kept for parity: the reference adds bias_ih to BOTH
            # projections and never uses bias_hh
            # (model_search_bayes.py:691-692, same as GPLSTMCell's quirk)
            std = xg_t + h @ w_hh_t + self.b_ih.astype(dtype)
            std_g = jnp.split(std, 4, axis=-1)
            if self.mode == "bayes":
                br = brx_t + h @ wh.T.astype(dtype)
                br_g = jnp.split(br, 4, axis=-1)
            acts = (jax.nn.sigmoid, jax.nn.sigmoid, jnp.tanh, jax.nn.sigmoid)
            outs = []
            brx_g = jnp.split(brx_t, 4, axis=-1)
            for g in range(4):
                if self.mode == "bayes":
                    # POST-activation blend (model_search_bayes.py:695-706):
                    # act(std_gate)*p0 + act(bayes_gate)*p1
                    outs.append(gate_w[g, 0] * acts[g](std_g[g])
                                + gate_w[g, 1] * acts[g](br_g[g]))
                else:
                    from ..models.layers import ACTS

                    _, w_h, coef, act_set = gp[g]
                    pre = brx_g[g] + h @ w_h.T.astype(dtype)
                    gp_out = None
                    for ai, act in enumerate(act_set):
                        term = ACTS[act](pre) * coef[ai].astype(dtype)
                        gp_out = term if gp_out is None else gp_out + term
                    outs.append(gate_w[g, 0] * acts[g](std_g[g]) + gate_w[g, 1] * gp_out)
            i, f, gg, o = outs
            c = f * c + i * gg
            h = o * jnp.tanh(c)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(step, hc, (xg, br_xg))
        return ys, (hT, cT)

    def branch_kl(self):
        if self.mode == "bayes":
            # sum of the four per-gate Bayes.kl_divergence() terms, each
            # mean-reduced WITH -1 over its own (H, IN+H) weight block and
            # (H,) bias (model_search_bayes.py:815-821). Equal-size blocks
            # make sum-of-block-means = 4 * full-array mean.
            return 4.0 * (
                gaussian.kl_std_normal_m1(self.br_mean, self.br_lgstd)
                + gaussian.kl_std_normal_m1(self.br_bias_mean, self.br_bias_lgstd)
            )
        return sum(b.kl() for b in self.branches)


class LSTMSupernet(nn.Module):
    """Searchable 2-layer LSTM LM (BayesLSTMModelSearch, :598-660)."""

    cfg: ModelConfig
    mode: str = "bayes"

    def setup(self):
        cfg = self.cfg
        self.embedding = self.param("embedding", tinit.uniform(0.1), (cfg.vocab_size, cfg.emsize))
        self.decoder_b = self.param("decoder_b", tinit.zeros(), (cfg.vocab_size,))
        self.drop = nn.Dropout(cfg.dropout)
        self.cells = [
            LSTMSearchCell(cfg.emsize if l == 0 else cfg.nhid, cfg.nhid, self.mode,
                           name=f"cell{l}")
            for l in range(cfg.nlayers)
        ]

    def __call__(self, tokens, hidden: Hidden, arch_weights, deterministic: bool = True,
                 gumbel_key=None, temperature: float = 5.0):
        """arch_weights: (nlayers, 4, 2) per-gate logits."""
        if gumbel_key is None:
            w = jax.nn.softmax(arch_weights, axis=-1)
        else:
            w = gumbel_softmax(arch_weights, gumbel_key, temperature)
        h0, c0 = hidden
        out = self.drop(jnp.take(self.embedding, tokens, axis=0), deterministic=deterministic)
        hs, cs = [], []
        for l, cell in enumerate(self.cells):
            out, (hT, cT) = cell(out, (h0[l], c0[l]), w[l], deterministic)
            hs.append(hT)
            cs.append(cT)
            # UNWEIGHTED branch KL: the reference adds every gate module's
            # kl_divergence() regardless of the arch weights
            # (train_search_bayes.py:322-330)
            self.sow("losses", "kl", cell.branch_kl())
        out = self.drop(out, deterministic=deterministic)
        logits = out @ self.embedding.T + self.decoder_b
        return logits, (jnp.stack(hs), jnp.stack(cs))


def build_supernet(cfg: ModelConfig, mode: str):
    if cfg.is_transformer:
        return TransformerSupernet(cfg, mode)
    return LSTMSupernet(cfg, mode)
