"""Transformer language models: standard / Bayesian / GP / Variational layers.

TPU re-design of the reference Transformer-family containers:

- ``TransformerModel`` (model.py:121-171), self-built ``MultiheadAttention``
  (model.py:836-928), ``BayesMultiheadAttention`` (:931-1019),
  ``StandardTransformerEncoderLayer`` (:1022-1046),
  ``BayesTransformerEncoderLayer``+``BayesTransformerModel`` (:1137-1309),
  ``GaussTransformerEncoderLayer``+``GaussTransformerModel`` (:2250-2364),
  ``VTransformerEncoderLayer``+``VTransformerModel`` (:2741-2897).

Layout is time-major (T, B, E); attention runs as batched einsums on the MXU
(ops/attention.py). Uncertainty placement rules preserved exactly: the
stochastic layer is layer 0 only (plus layer 1 for T_v_pos 2/3), including
the reference's off-by-one where v_pos 2/3 builds nlayers-1 total layers
(model.py:2830-2843).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops import gaussian
from ..ops.attention import causal_mask, multihead_attention, sinusoidal_positional_encoding
from . import initializers as tinit
from .layers import GPNN, GPNN2, BayesDense


class MultiheadSelfAttention(nn.Module):
    """Fused-qkv self-attention (model.py:836-928): xavier qkv weight, zero
    biases on qkv and o projections."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True, mem=None):
        """``mem`` (M, B, E): Transformer-XL-style segment memory — keys and
        values extend over [mem; x] (projected with the same weights) while
        queries come from x; pass a matching (T, M+T) additive mask."""
        qkv_net = nn.Dense(
            3 * self.embed_dim,
            kernel_init=tinit.xavier_uniform(),
            bias_init=tinit.zeros(),
            dtype=self.dtype,
            name="qkv_net",
        )
        q, k, v = jnp.split(qkv_net(x), 3, axis=-1)
        if mem is not None:
            _, mk, mv = jnp.split(qkv_net(mem), 3, axis=-1)
            k = jnp.concatenate([mk, k], axis=0)
            v = jnp.concatenate([mv, v], axis=0)
        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        out = multihead_attention(
            q, k, v, self.num_heads, attn_mask, self.dropout, rng, deterministic,
            causal=(mem is None),
        )
        return nn.Dense(
            self.embed_dim,
            kernel_init=tinit.torch_linear_weight(self.embed_dim),
            bias_init=tinit.zeros(),
            dtype=self.dtype,
            name="o_net",
        )(out)


class BayesMultiheadSelfAttention(nn.Module):
    """Separate q/k/v projections with a Bayesian output projection
    (model.py:931-1019). The reference never calls _reset_parameters here, so
    q/k/v keep torch's default Linear init; o_net is a bias-free BayesLinear."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        E = self.embed_dim
        kw = dict(
            kernel_init=tinit.torch_linear_weight(E),
            bias_init=tinit.torch_linear_bias(E), dtype=self.dtype,
        )
        self.q_net = nn.Dense(E, **kw)
        self.k_net = nn.Dense(E, **kw)
        self.v_net = nn.Dense(E, **kw)
        self.o_net = BayesDense(E, E)

    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        q, k, v = self.q_net(x), self.k_net(x), self.v_net(x)
        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        out = multihead_attention(
            q, k, v, self.num_heads, attn_mask, self.dropout, rng, deterministic,
            causal=True,
        )
        return self.o_net(out, deterministic=deterministic)


class StandardEncoderLayer(nn.Module):
    """Post-LN encoder layer with GELU FFN (model.py:1022-1046)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d, ff = self.d_model, self.dim_feedforward
        self.self_attn = MultiheadSelfAttention(d, self.nhead, self.dropout,
                                                dtype=self.dtype)
        self.linear1 = nn.Dense(
            ff, kernel_init=tinit.torch_linear_weight(d),
            bias_init=tinit.torch_linear_bias(d), dtype=self.dtype,
        )
        self.linear2 = nn.Dense(
            d, kernel_init=tinit.torch_linear_weight(ff),
            bias_init=tinit.torch_linear_bias(ff), dtype=self.dtype,
        )
        # layer norms compute in f32 (promoted) for stable statistics; the
        # output is cast back to the compute dtype
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)

    def _norm(self, norm, x):
        y = norm(x)
        return y if self.dtype is None else y.astype(self.dtype)

    def __call__(self, src, attn_mask=None, deterministic: bool = True, mem=None):
        src2 = self.self_attn(src, attn_mask, deterministic, mem=mem)
        src = self._norm(self.norm1, src + self.drop(src2, deterministic=deterministic))
        src2 = self.linear2(
            self.drop(jax.nn.gelu(self.linear1(src), approximate=False), deterministic=deterministic)
        )
        src = self._norm(self.norm2, src + self.drop(src2, deterministic=deterministic))
        return src


class BayesEncoderLayer(nn.Module):
    """Bayes at FFN (linear2 -> bias-free BayesDense, model.py:1149-1153) or
    MHA (BayesMultiheadSelfAttention, model.py:1141-1146)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    bayes_pos: str = "FFN"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d, ff = self.d_model, self.dim_feedforward
        if self.bayes_pos == "MHA":
            self.self_attn = BayesMultiheadSelfAttention(d, self.nhead, self.dropout,
                                                         dtype=self.dtype)
        else:
            self.self_attn = MultiheadSelfAttention(d, self.nhead, self.dropout,
                                                    dtype=self.dtype)
        self.linear1 = nn.Dense(
            ff, kernel_init=tinit.torch_linear_weight(d),
            bias_init=tinit.torch_linear_bias(d), dtype=self.dtype,
        )
        if self.bayes_pos == "FFN":
            self.linear2 = BayesDense(ff, d)
        else:
            self.linear2 = nn.Dense(
                d, kernel_init=tinit.torch_linear_weight(ff),
                bias_init=tinit.torch_linear_bias(ff), dtype=self.dtype,
            )
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)

    def _norm(self, norm, x):
        y = norm(x)
        return y if self.dtype is None else y.astype(self.dtype)

    def __call__(self, src, attn_mask=None, deterministic: bool = True):
        src2 = self.self_attn(src, attn_mask, deterministic)
        src = self._norm(self.norm1, src + self.drop(src2, deterministic=deterministic))
        mid = self.drop(jax.nn.gelu(self.linear1(src), approximate=False), deterministic=deterministic)
        if self.bayes_pos == "FFN":
            src2 = self.linear2(mid, deterministic=deterministic)
        else:
            src2 = self.linear2(mid)
        src = self._norm(self.norm2, src + self.drop(src2, deterministic=deterministic))
        return src

    def kl(self):
        """KL of the Bayesian sub-module (train.py:341-352)."""
        if self.bayes_pos == "FFN":
            return self.linear2.kl()
        return self.self_attn.o_net.kl()


class GaussEncoderLayer(nn.Module):
    """GP-FFN layer: linear1 replaced by a GP unit (model.py:2250-2287).

    gauss_pos 0-3 -> GPNN (one fresh sample per forward via
    sample_parameters, model.py:2281); 4 -> GPNN2. Note the reference applies
    dropout to the GP output then linear2 — there is no extra activation.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    gauss_pos: int = 3
    sample_enabled: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d, ff = self.d_model, self.dim_feedforward
        self.self_attn = MultiheadSelfAttention(d, self.nhead, self.dropout,
                                                dtype=self.dtype)
        acts = ("tanh", "sigmoid", "relu", "gelu")
        if 0 <= self.gauss_pos <= 3:
            self.gpnn = GPNN(d, ff, act_set=acts, gpnn_type=self.gauss_pos,
                             sample_enabled=self.sample_enabled)
        else:
            self.gpnn = GPNN2(d, ff, act_set=acts)
        self.linear2 = nn.Dense(
            d, kernel_init=tinit.torch_linear_weight(ff),
            bias_init=tinit.torch_linear_bias(ff), dtype=self.dtype,
        )
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)

    def _norm(self, norm, x):
        y = norm(x)
        return y if self.dtype is None else y.astype(self.dtype)

    def __call__(self, src, attn_mask=None, deterministic: bool = True):
        src2 = self.self_attn(src, attn_mask, deterministic)
        src = self._norm(self.norm1, src + self.drop(src2, deterministic=deterministic))
        gp_out = self.gpnn(src, deterministic=deterministic)
        src2 = self.linear2(self.drop(gp_out, deterministic=deterministic))
        src = self._norm(self.norm2, src + self.drop(src2, deterministic=deterministic))
        return src

    def kl(self):
        return self.gpnn.kl()


class VEncoderLayer(nn.Module):
    """Variational layer: additive noise on the FFN output when the sequence
    length equals ``v_seq_len`` (model.py:2741-2805).

    Parity notes: the learnable (v_seq_len, 1, d) posterior/prior tables keep
    the reference's actual U(0,1) init (its reset_parameters is never
    called); the noise std exp(hidden * hiddens_lgstd) realizes the intent of
    sample_weight_diff (model.py:2786-2792), whose ``self.hiddens`` read is a
    latent bug — the stored FFN output ``self.hidden`` is the only matching
    tensor.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    v_seq_len: int = 100
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d, ff = self.d_model, self.dim_feedforward
        self.self_attn = MultiheadSelfAttention(d, self.nhead, self.dropout,
                                                dtype=self.dtype)
        self.linear1 = nn.Dense(
            ff, kernel_init=tinit.torch_linear_weight(d),
            bias_init=tinit.torch_linear_bias(d), dtype=self.dtype,
        )
        self.linear2 = nn.Dense(
            d, kernel_init=tinit.torch_linear_weight(ff),
            bias_init=tinit.torch_linear_bias(ff), dtype=self.dtype,
        )
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)
        rand01 = lambda k, s: jax.random.uniform(k, s)
        L, dm = self.v_seq_len, self.d_model
        self.hiddens_mean_p = self.param("hiddens_mean_p", rand01, (L, 1, dm))
        self.hiddens_lgstd_p = self.param("hiddens_lgstd_p", rand01, (L, 1, dm))
        self.hiddens_mean = self.param("hiddens_mean", rand01, (L, 1, dm))
        self.hiddens_lgstd = self.param("hiddens_lgstd", rand01, (L, 1, dm))

    def __call__(self, src, attn_mask=None, deterministic: bool = True, count_kl: bool = False):
        src2 = self.self_attn(src, attn_mask, deterministic)
        src = self.norm1(src + self.drop(src2, deterministic=deterministic))
        if self.dtype is not None:
            src = src.astype(self.dtype)
        src2 = self.linear2(
            self.drop(jax.nn.gelu(self.linear1(src), approximate=False), deterministic=deterministic)
        )
        hidden = src2
        T = src2.shape[0]
        if not deterministic and T == self.v_seq_len:
            std = jnp.exp(hidden * self.hiddens_lgstd.astype(hidden.dtype))
            eps = 0.1 * jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
            src2 = src2 + eps * std
        if count_kl:
            # KL gated on training & seq_len==v_seq_len (model.py:2770-2781);
            # prior mean is hidden * hiddens_mean_p.
            if not deterministic and T == self.v_seq_len:
                prior_mean = hidden * self.hiddens_mean_p.astype(hidden.dtype)
                kl = (
                    jnp.mean(
                        (hidden - prior_mean) ** 2.0
                        - self.hiddens_lgstd * 2.0
                        + jnp.exp(self.hiddens_lgstd * 2.0)
                    )
                    / 2.0
                )
            else:
                kl = jnp.asarray(0.0)
            self.sow("losses", "kl", kl)
        src = self.norm2(src + self.drop(src2, deterministic=deterministic))
        # cast back after norm2 too (layer norms run f32): without this each
        # V layer re-promotes the residual stream and the downstream layers
        # silently compute at f32 width
        if self.dtype is not None:
            src = src.astype(self.dtype)
        return src


class TransformerLM(nn.Module):
    """Embedding*sqrt(d) -> [EMB Bayes projection] -> pos-enc -> layers ->
    [EMB transpose-reuse] -> tied decoder.

    Layer stacks per uncertainty (model.py:1195-1213, :2304-2313,
    :2822-2843); stochastic layers use dropout=0.2 regardless of the model
    dropout, matching the hardcoded value at model.py:1202,1207.
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        E, ff, n = cfg.emsize, cfg.nhid, cfg.nlayers
        self.embedding = self.param(
            "embedding", tinit.uniform(0.1), (cfg.vocab_size, E)
        )
        if not cfg.tied:
            self.decoder_w = self.param("decoder_w", tinit.uniform(0.1), (cfg.vocab_size, E))
        self.decoder_b = self.param("decoder_b", tinit.zeros(), (cfg.vocab_size,))
        self.drop = nn.Dropout(cfg.dropout)
        self.pe = sinusoidal_positional_encoding(5000, E)

        cdt = jnp.dtype(cfg.compute_dtype)
        ldt = None if cdt == jnp.float32 else cdt  # None = flax promotion (f32)
        std = lambda: StandardEncoderLayer(E, cfg.nhead, ff, cfg.dropout, dtype=ldt)
        layers = []
        u = cfg.uncertainty
        if u == "none" or (u == "Bayesian" and cfg.t_bayes_pos in ("none", "EMB")):
            layers = [std() for _ in range(n)]
        elif u == "Bayesian":
            layers = [BayesEncoderLayer(E, cfg.nhead, ff, 0.2, cfg.t_bayes_pos,
                                        dtype=ldt)]
            layers += [std() for _ in range(n - 1)]
        elif u == "Gaussian":
            if cfg.t_gauss_pos > 4:
                layers = [std() for _ in range(n)]
            else:
                layers = [
                    GaussEncoderLayer(
                        E, cfg.nhead, ff, cfg.dropout, cfg.t_gauss_pos, cfg.gp_sample,
                        dtype=ldt,
                    )
                ]
                layers += [std() for _ in range(n - 1)]
        elif u == "Variational":
            v = cfg.t_v_pos
            mk_v = lambda: VEncoderLayer(E, cfg.nhead, ff, cfg.dropout, cfg.v_seq_len,
                                         dtype=ldt)
            if v == 0:
                layers = [std() for _ in range(n)]
            elif v == 1:
                layers = [mk_v()] + [std() for _ in range(n - 1)]
            elif v == 2:
                # Reference off-by-one kept: nlayers-1 total (model.py:2830-2835)
                layers = [std(), mk_v()] + [std() for _ in range(n - 3)]
            elif v == 3:
                layers = [mk_v(), mk_v()] + [std() for _ in range(n - 3)]
        self.layers = layers

        if u == "Bayesian" and cfg.t_bayes_pos == "EMB":
            stde = 1.0 / math.sqrt(E + 1)
            self.embed_mean = self.param("embed_mean", tinit.uniform(stde), (E, E))
            self.embed_lgstd = self.param("embed_lgstd", gaussian.lgstd_init(stde), (E, E))

    def __call__(self, tokens, deterministic: bool = True, mems=None,
                 mem_len=None, return_mems: bool = False,
                 return_hidden: bool = False, positions=None, pack_mask=None,
                 emb_in=None):
        """tokens: (T, B) int32 -> logits (T, B, V).

        ``mems``: optional per-layer list of (M, B, E) segment memories
        (Transformer-XL-style cross-utterance context, the dev scorer's
        `--model_var XL` capability, `…copy.py`:206-217). Queries attend
        causally over [mem; x], and this segment's positions CONTINUE from
        the real memory length, so with mems built from a standalone pass
        over the previous tokens the output equals the suffix of a
        full-context forward exactly (tests/test_xl_mems.py).

        ``mem_len``: int32 scalar — memories may be RIGHT-padded to a
        bucketed length; only rows [0, mem_len) are real, the rest are
        masked out of attention and excluded from the position offset.
        ``return_mems`` additionally returns the new per-layer memories
        (this segment's layer inputs) for the next call.

        ``positions`` (T, B) int32 + ``pack_mask`` (B, 1, T, T) additive:
        sequence-PACKED scoring — several independent hypotheses share one
        time axis per column; positions restart at each segment and the
        mask must encode causal-within-segment (the packed rescorer,
        rescore/scorer.py). Incompatible with mems.
        """
        cfg = self.cfg
        T = tokens.shape[0]
        dtype = jnp.dtype(cfg.compute_dtype)
        if pack_mask is not None:
            if mems is not None:
                raise ValueError("pack_mask is incompatible with mems")
            mask = pack_mask
            pos_offset = None
        elif mems is not None:
            M = mems[0].shape[0]
            ml = (
                jnp.asarray(M, jnp.int32)
                if mem_len is None
                else jnp.asarray(mem_len, jnp.int32)
            )
            rows = jnp.arange(T)[:, None]
            cols = jnp.arange(M + T)[None, :]
            mask = jnp.where(
                (cols < ml) | ((cols >= M) & (cols <= rows + M)), 0.0, -jnp.inf
            ).astype(jnp.float32)
            pos_offset = ml  # number of REAL memory tokens
        else:
            # None = implicit causal: multihead_attention owns the mask and
            # the Pallas flash routes stay eligible (ops/attention.py).
            mask = None
            pos_offset = None

        # ``emb_in``: precomputed embedding rows (T, B, E) — the tensor-
        # parallel shard_map train step embeds from its local vocab shard
        # and bypasses the full-table lookup (parallel/train_parallel.py).
        x = (jnp.take(self.embedding, tokens, axis=0)
             if emb_in is None else emb_in).astype(dtype) * math.sqrt(cfg.emsize)

        is_emb = cfg.uncertainty == "Bayesian" and cfg.t_bayes_pos == "EMB"
        if is_emb:
            w = self.embed_mean
            if not deterministic:
                w = w + gaussian.sample_diff(self.make_rng("sample"), self.embed_lgstd)
            x = x @ w.T.astype(dtype)

        if positions is not None:
            x = x + jnp.take(self.pe, positions, axis=0).astype(dtype)
        elif pos_offset is None:
            x = x + self.pe[:T, None, :].astype(dtype)
        else:
            pe = jax.lax.dynamic_slice_in_dim(self.pe, pos_offset, T, axis=0)
            x = x + pe[:, None, :].astype(dtype)
        x = self.drop(x, deterministic=deterministic)

        v_layers = self._v_kl_layers()
        new_mems = []
        for i, layer in enumerate(self.layers):
            if return_mems:
                new_mems.append(x)
            if isinstance(layer, VEncoderLayer):
                x = layer(x, mask, deterministic, count_kl=(i in v_layers))
            elif isinstance(layer, StandardEncoderLayer):
                x = layer(x, mask, deterministic,
                          mem=(mems[i] if mems is not None else None))
            else:
                x = layer(x, mask, deterministic)

        # KL dispatch (train.py:335-356, :358-365).
        if cfg.uncertainty == "Bayesian":
            if cfg.t_bayes_pos in ("FFN", "MHA"):
                self.sow("losses", "kl", self.layers[0].kl())
            elif cfg.t_bayes_pos == "EMB":
                self.sow(
                    "losses", "kl", gaussian.kl_std_normal(self.embed_mean, self.embed_lgstd)
                )
        elif cfg.uncertainty == "Gaussian" and 1 <= cfg.t_gauss_pos <= 3:
            self.sow("losses", "kl", self.layers[0].kl())

        if is_emb:
            # transpose-reuse before decoding (model.py:1302-1307): uses the
            # MEAN projection, not the sampled one.
            x = x @ self.embed_mean.astype(dtype)

        if return_hidden:
            # pre-decoder states for the fused decode+CE kernel
            return (x, new_mems) if return_mems else x
        dec_w = self.embedding if cfg.tied else self.decoder_w
        logits = x @ dec_w.T.astype(dtype) + self.decoder_b.astype(dtype)
        logits = logits.astype(jnp.float32)
        if return_mems:
            return logits, new_mems
        return logits

    def _v_kl_layers(self):
        """Which layer indices contribute variational KL (train.py:386-397)."""
        if self.cfg.uncertainty != "Variational":
            return ()
        return {0: (), 1: (0,), 2: (1,), 3: (0, 1)}[self.cfg.t_v_pos]
