"""Recurrent language models: standard / Bayesian / GP / Variational cores.

TPU re-design of the reference LSTM-family containers:

- ``RNNModel`` (model.py:23-73), ``BayesRNNModel``+``Bayes2LSTM``
  (model.py:179-229, :585-828), ``BayesLSTM`` single-layer variant
  (model.py:364-582), ``GaussRNNModel``+``GPLSTM``+``GPLSTMCell``
  (model.py:1317-1777), ``VariationalRNNModel``+``VariationalLSTM``+
  ``VLSTMCell``+``VNN`` (model.py:2373-2579).

All recurrences run as ``lax.scan`` with input projections hoisted into one
big MXU matmul (see ops/lstm.py) — replacing both the cuDNN fused kernel and
the reference's per-timestep python loops. Weight sampling happens ONCE per
call (= per optimizer step), outside the scan, matching the reference's
flat_parameters semantics (model.py:705-732).

Containers sow KL terms into the ``losses`` collection following exactly the
training-loss dispatch of train.py:335-399.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops import gaussian
from ..ops.lstm import LSTMParams, gru_layer, lstm_layer, lstm_stack2, rnn_layer
from . import initializers as tinit
from .layers import GPNN, GPNN2, VNN

Hidden = Tuple[jax.Array, jax.Array]  # (h, c) each (nlayers, B, H)


def init_hidden(nlayers: int, batch: int, nhid: int, dtype=jnp.float32) -> Hidden:
    z = jnp.zeros((nlayers, batch, nhid), dtype=dtype)
    return (z, z)


def _rnn_param_init(nhid: int):
    return tinit.uniform(1.0 / math.sqrt(nhid))


def _layer_params(mod: nn.Module, name: str, gates: int, in_size: int, nhid: int) -> LSTMParams:
    init = _rnn_param_init(nhid)
    return LSTMParams(
        w_ih=mod.param(f"{name}_w_ih", init, (gates * nhid, in_size)),
        w_hh=mod.param(f"{name}_w_hh", init, (gates * nhid, nhid)),
        b_ih=mod.param(f"{name}_b_ih", init, (gates * nhid,)),
        b_hh=mod.param(f"{name}_b_hh", init, (gates * nhid,)),
    )


class StandardRNNCore(nn.Module):
    """Multi-layer LSTM/GRU/RNN with inter-layer dropout (torch nn.LSTM
    semantics: dropout on every layer's output except the last)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, hidden: Hidden, deterministic: bool = True, step_mask=None,
                 reset_mask=None, reset_src=None):
        cfg = self.cfg
        gates = {"LSTM": 4, "GRU": 3, "RNN_TANH": 1, "RNN_RELU": 1}[cfg.model]
        h0, c0 = hidden
        if cfg.model == "LSTM" and cfg.nlayers == 2:
            # Hot path (every recipe trains a 2-layer LSTM): fuse both layers
            # into one sequential Pallas grid when available (lstm_stack2).
            p_0 = _layer_params(self, "l0", 4, cfg.emsize, cfg.nhid)
            p_1 = _layer_params(self, "l1", 4, cfg.nhid, cfg.nhid)
            dmask = None
            if cfg.dropout > 0 and not deterministic:
                keep_p = 1.0 - cfg.dropout
                bern = jax.random.bernoulli(
                    self.make_rng("dropout"), keep_p,
                    (x.shape[0], x.shape[1], cfg.nhid))
                dmask = bern.astype(x.dtype) / keep_p
            out, hs, cs = lstm_stack2(
                x, h0, c0, p_0, p_1, step_mask=step_mask,
                allow_pallas=deterministic, reset_mask=reset_mask,
                reset_src=reset_src, dropout_mask=dmask)
            return out, (jnp.stack(hs), jnp.stack(cs))
        hs, cs = [], []
        out = x
        for l in range(cfg.nlayers):
            in_size = cfg.emsize if l == 0 else cfg.nhid
            p = _layer_params(self, f"l{l}", gates, in_size, cfg.nhid)
            if cfg.model == "LSTM":
                out, hT, cT = lstm_layer(out, h0[l], c0[l], p, step_mask=step_mask, allow_pallas=deterministic,
                                         reset_mask=reset_mask, reset_src=reset_src)
                cs.append(cT)
            elif cfg.model == "GRU":
                out, hT = gru_layer(out, h0[l], p, step_mask=step_mask,
                                    reset_mask=reset_mask, reset_src=reset_src)
                cs.append(jnp.zeros_like(hT))
            else:
                out, hT = rnn_layer(
                    out, h0[l], p, "tanh" if cfg.model == "RNN_TANH" else "relu",
                    step_mask=step_mask,
                    reset_mask=reset_mask, reset_src=reset_src,
                )
                cs.append(jnp.zeros_like(hT))
            hs.append(hT)
            if l < cfg.nlayers - 1 and cfg.dropout > 0:
                out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        return out, (jnp.stack(hs), jnp.stack(cs))


class BayesLSTMCore(nn.Module):
    """Two-layer LSTM with Gaussian gate-slice posteriors.

    ``both_layers=True`` follows ``Bayes2LSTM`` (model.py:585-828, the variant
    used by BayesRNNModel): positions 1-4 sample the [i,f,g,o] gate row-slice
    of BOTH layers but the KL covers layer 1 only (model.py:737-781);
    position 5 samples nothing and contributes the summed-means KL quirk.

    ``both_layers=False`` follows ``BayesLSTM`` (model.py:364-582): positions
    1-4 sample layer 1 only; position 5 samples the whole of layer 2 with
    gate-size lgstds while its KL reads layer-1 means.

    No inter-layer dropout in either variant (the reference passes dropout=0
    to the fused kernel, model.py:812).
    """

    cfg: ModelConfig
    both_layers: bool = True

    @nn.compact
    def __call__(self, x, hidden: Hidden, deterministic: bool = True, step_mask=None,
                 reset_mask=None, reset_src=None):
        cfg = self.cfg
        H, in1, in2 = cfg.nhid, cfg.emsize, cfg.nhid
        pos = cfg.l_bayes_pos
        init = _rnn_param_init(H)
        lg = gaussian.lgstd_init(1.0 / math.sqrt(H))

        means = []
        for l, in_size in ((1, in1), (2, in2)):
            means.append(
                dict(
                    w_ih=self.param(f"weight_ih_mean_{l}", init, (4 * H, in_size)),
                    w_hh=self.param(f"weight_hh_mean_{l}", init, (4 * H, H)),
                    b_ih=self.param(f"bias_ih_mean_{l}", init, (4 * H,)),
                    b_hh=self.param(f"bias_hh_mean_{l}", init, (4 * H,)),
                )
            )

        lgstds = {}
        if 1 <= pos <= 4:
            layers_with_lgstd = (1, 2) if self.both_layers else (1,)
            for l in layers_with_lgstd:
                in_size = in1 if l == 1 else in2
                lgstds[l] = dict(
                    w_hh=self.param(f"weight_hh_lgstd_{l}", lg, (H, H)),
                    w_ih=self.param(f"weight_ih_lgstd_{l}", lg, (H, in_size)),
                    b_hh=self.param(f"bias_hh_lgstd_{l}", lg, (H,)),
                    b_ih=self.param(f"bias_ih_lgstd_{l}", lg, (H,)),
                )
        elif pos == 5:
            layers_with_lgstd = (1, 2) if self.both_layers else (1,)
            for l in layers_with_lgstd:
                in_size = in1 if l == 1 else in2
                lgstds[l] = dict(
                    w_hh=self.param(f"weight_hh_lgstd_{l}", lg, (4 * H, H)),
                    w_ih=self.param(f"weight_ih_lgstd_{l}", lg, (4 * H, in_size)),
                    b_hh=self.param(f"bias_hh_lgstd_{l}", lg, (4 * H,)),
                    b_ih=self.param(f"bias_ih_lgstd_{l}", lg, (4 * H,)),
                )

        # --- sample-and-add into the gate slice (flat_parameters semantics,
        # model.py:705-732): ONE epsilon per call, drawn outside the scan.
        # 2D slices route through the fused on-core sampler (ops/bayes_matmul
        # sample_noise: exp(lgstd)*eps from the kernel PRNG, custom VJP) when
        # shapes qualify; biases and odd shapes keep the XLA path. Same
        # distribution, different bits than jax.random.
        from ..ops.bayes_matmul import sample_noise, sample_noise_ok
        from ..ops.kernel_gate import pallas_allowed

        eff = [dict(m) for m in means]
        if not deterministic and 1 <= pos <= 4:
            rows = slice((pos - 1) * H, pos * H)
            sampled_layers = (0, 1) if self.both_layers else (0,)
            for li in sampled_layers:
                lp = lgstds[li + 1]
                key = self.make_rng("sample")
                ks = jax.random.split(key, 4)
                for i, (pname, lname) in enumerate(
                    (("w_hh", "w_hh"), ("w_ih", "w_ih"), ("b_hh", "b_hh"), ("b_ih", "b_ih"))
                ):
                    lg = lp[lname]
                    if sample_noise_ok(jnp.shape(lg)) and pallas_allowed():
                        seed = jax.random.randint(
                            ks[i], (1,), 0, 2**31 - 1, dtype=jnp.int32
                        )
                        diff = sample_noise(lg, seed)
                    else:
                        diff = gaussian.sample_diff(ks[i], lg)
                    eff[li][pname] = eff[li][pname].at[rows].add(diff)
        elif not deterministic and pos == 5 and not self.both_layers:
            # BayesLSTM pos 5: whole-layer sample added to LAYER 2 weights
            # using the (gate-size) layer-1 lgstds (model.py:483-489).
            lp = lgstds[1]
            ks = jax.random.split(self.make_rng("sample"), 4)
            eff[1]["w_hh"] = eff[1]["w_hh"] + gaussian.sample_diff(ks[0], lp["w_hh"])
            eff[1]["w_ih"] = eff[1]["w_ih"] + gaussian.sample_diff(ks[1], lp["w_ih"])
            eff[1]["b_hh"] = eff[1]["b_hh"] + gaussian.sample_diff(ks[2], lp["b_hh"])
            eff[1]["b_ih"] = eff[1]["b_ih"] + gaussian.sample_diff(ks[3], lp["b_ih"])

        h0, c0 = hidden
        p_0 = LSTMParams(eff[0]["w_ih"], eff[0]["w_hh"], eff[0]["b_ih"], eff[0]["b_hh"])
        p_1 = LSTMParams(eff[1]["w_ih"], eff[1]["w_hh"], eff[1]["b_ih"], eff[1]["b_hh"])
        out, hs, cs = lstm_stack2(
            x, h0, c0, p_0, p_1, step_mask=step_mask,
            allow_pallas=deterministic, reset_mask=reset_mask,
            reset_src=reset_src)

        prior_w = None
        if self.has_variable("priors", "weight_hh_mean_1") and self.has_variable(
            "priors", "weight_ih_mean_1"
        ):
            prior_w = (
                self.get_variable("priors", "weight_hh_mean_1"),
                self.get_variable("priors", "weight_ih_mean_1"),
            )
        self.sow("losses", "kl", self.kl_value(means, lgstds, prior_w))
        return out, (jnp.stack(hs), jnp.stack(cs))

    def kl_value(self, means, lgstds, prior_w=None):
        """KL dispatch of Bayes(2)LSTM.kl_divergence (model.py:492-529,
        :737-781): mean-reduced closed form vs N(0,1), layer-1 slice only.

        With ``prior_w = (prior_w_hh_1, prior_w_ih_1)`` the prior branch
        (model.py:520-528, :767-775) applies instead: SUM-reduced weight-only
        KL of the layer-1 slice against the prior means (the reference's
        README step-3 finetune-with-prior semantics)."""
        cfg = self.cfg
        H, pos = cfg.nhid, cfg.l_bayes_pos
        if not 1 <= pos <= 5:
            return jnp.asarray(0.0)
        if prior_w is not None:
            m1, lp = means[0], lgstds[1]
            p_hh, p_ih = prior_w
            if 1 <= pos <= 4:
                rows = slice((pos - 1) * H, pos * H)
                w_mean = jnp.concatenate([m1["w_hh"][rows], m1["w_ih"][rows]], -1)
                w_lgstd = jnp.concatenate([lp["w_hh"], lp["w_ih"]], -1)
                prior = jnp.concatenate([p_hh[rows], p_ih[rows]], -1)
            else:  # pos == 5 (quirks as in the zero-prior branch)
                w_mean = jnp.concatenate([m1["w_hh"], m1["w_ih"]], -1)
                w_lgstd = jnp.concatenate([lp["w_hh"], lp["w_ih"]], -1)
                if self.both_layers and 2 in lgstds:
                    m2, lp2 = means[1], lgstds[2]
                    w_mean = w_mean + jnp.concatenate([m2["w_hh"], m1["w_ih"]], -1)
                    w_lgstd = w_lgstd + jnp.concatenate([lp2["w_hh"], lp["w_ih"]], -1)
                prior = jnp.concatenate([p_hh, p_ih], -1)
            return gaussian.kl_vs_prior_sum(w_mean, w_lgstd, prior)
        m1, lp = means[0], lgstds[1]
        if 1 <= pos <= 4:
            rows = slice((pos - 1) * H, pos * H)
            w_mean = jnp.concatenate([m1["w_hh"][rows], m1["w_ih"][rows]], -1)
            w_lgstd = jnp.concatenate([lp["w_hh"], lp["w_ih"]], -1)
            b_mean = jnp.concatenate([m1["b_hh"][rows], m1["b_ih"][rows]], -1)
            b_lgstd = jnp.concatenate([lp["b_hh"], lp["b_ih"]], -1)
        else:  # pos == 5
            w_mean = jnp.concatenate([m1["w_hh"], m1["w_ih"]], -1)
            w_lgstd = jnp.concatenate([lp["w_hh"], lp["w_ih"]], -1)
            b_mean = jnp.concatenate([m1["b_hh"], m1["b_ih"]], -1)
            b_lgstd = jnp.concatenate([lp["b_hh"], lp["b_ih"]], -1)
            if self.both_layers and 2 in lgstds:
                # Bayes2LSTM pos-5 quirk: add layer-2 hh + layer-1 ih
                # (model.py:752-756).
                m2, lp2 = means[1], lgstds[2]
                w_mean = w_mean + jnp.concatenate([m2["w_hh"], m1["w_ih"]], -1)
                w_lgstd = w_lgstd + jnp.concatenate([lp2["w_hh"], lp["w_ih"]], -1)
                b_mean = b_mean + jnp.concatenate([m2["b_hh"], m1["b_ih"]], -1)
                b_lgstd = b_lgstd + jnp.concatenate([lp2["b_hh"], lp["b_ih"]], -1)
        return gaussian.kl_std_normal(w_mean, w_lgstd) + gaussian.kl_std_normal(
            b_mean, b_lgstd
        )


class GPLSTMCell(nn.Module):
    """One GP-activation LSTM layer run as a scan.

    Reference: ``GPLSTMCell`` (model.py:1683-1777). ``gate_type`` 1-4
    substitutes the corresponding gate with a GP unit over cat(x_t, h_{t-1});
    5 transforms the cell state; 6/7 replace the hidden/input projection with
    a 4H-wide GP unit. ``gpnn_type`` 0-3 selects GPNN (sampled once per
    sequence); 4 selects GPNN2 applied to the pre-activation gate value
    (resampled every timestep during training).

    Gate bias quirk kept for parity: the reference adds ``bias_ih`` to BOTH
    projections and never uses ``bias_hh`` (model.py:1749-1753).
    """

    input_size: int
    hidden_size: int
    gate_type: int
    gpnn_type: int
    sample_enabled: bool = False

    def setup(self):
        H, in_size = self.hidden_size, self.input_size
        init = _rnn_param_init(H)
        self.weights_ih = self.param("weights_ih", init, (4 * H, in_size))
        self.bias_ih = self.param("bias_ih", tinit.zeros(), (4 * H,))
        self.weights_hh = self.param("weights_hh", init, (4 * H, H))
        self.bias_hh = self.param("bias_hh", tinit.zeros(), (4 * H,))

        g, t = self.gate_type, self.gpnn_type
        if t <= 3:
            if g == 3:
                self.gpnn = GPNN(H + in_size, H, gpnn_type=t, sample_enabled=self.sample_enabled)
            elif g in (1, 4):
                self.gpnn = GPNN(
                    H + in_size, H, act_set=("sigmoid", "tanh", "relu"),
                    gpnn_type=t, sample_enabled=self.sample_enabled,
                )
            elif g == 2:
                self.gpnn = GPNN(
                    H + in_size, H, act_set=("sigmoid",),
                    gpnn_type=t, sample_enabled=self.sample_enabled,
                )
            elif g == 5:
                self.gpnn = GPNN(H, H, gpnn_type=t, sample_enabled=self.sample_enabled)
            elif g in (6, 7):
                self.gpnn = GPNN(in_size, 4 * H, gpnn_type=t, sample_enabled=self.sample_enabled)
        elif t == 4:
            out = H if g <= 5 else 4 * H
            self.gpnn = GPNN2(H, out, act_set=("sigmoid", "relu", "tanh"))

    def __call__(self, x, hc, deterministic: bool = True, step_mask=None,
                 reset_mask=None, reset_src=None):
        H = self.hidden_size
        g, t = self.gate_type, self.gpnn_type
        dtype = x.dtype
        T, B, _ = x.shape
        h0, c0 = hc

        w_ih_t = self.weights_ih.T.astype(dtype)
        w_hh_t = self.weights_hh.T.astype(dtype)
        b_ih = self.bias_ih.astype(dtype)

        # Hoist all x-only projections over the full sequence (MXU-friendly).
        if g == 7 and t <= 3:
            drawn = self.gpnn.draw(deterministic)
            gp_x = self.gpnn.apply_drawn(x, *drawn, self.gpnn.act_set)
            xg = gp_x  # gates = gpnn(x) + h @ W_hh + b_ih

            # With the GP unit fully hoisted, the recurrence IS the
            # standard LSTM step (per-step bias = b_ih, the quirk) — route
            # it through the standard fused train kernel.
            if reset_mask is None:
                import os as _os

                from ..ops.kernel_gate import pallas_allowed
                from ..ops.lstm_pallas import lstm_scan_fused, pallas_lstm_ok

                if (
                    _os.environ.get("BAYESLM_PALLAS_GPLSTM", "1") != "0"
                    and pallas_allowed()
                    and pallas_lstm_ok(H, dtype, batch=B, train=True)
                ):
                    m2 = (step_mask if step_mask is not None
                          else jnp.ones((T, B)))
                    mask8 = jnp.broadcast_to(
                        m2.astype(dtype)[:, :, None], (T, B, 8))
                    ys, _cs, hT, cT = lstm_scan_fused(
                        xg, self.weights_hh.T.astype(dtype),
                        self.bias_ih.astype(dtype).reshape(1, 4 * H),
                        mask8, h0.astype(dtype), c0.astype(dtype))
                    return ys, (hT, cT)
        else:
            xg = (x.reshape(T * B, -1) @ w_ih_t + b_ih).reshape(T, B, 4 * H)

        # GPNN over cat(x, h): split its weight so the x part is hoisted too.
        gp_pre_x = None
        drawn = None
        if t <= 3 and g in (1, 2, 3, 4, 5, 6):
            drawn = self.gpnn.draw(deterministic)  # one sample per sequence
            w, b, coef = drawn

            # Gate-6 fused Pallas recurrence: the GPNN replaces the whole
            # hidden projection, so the step is the standard fused LSTM
            # recurrence with the 3-act mixture applied to the VMEM-resident
            # h @ W' matmul — W'/b'/coef never re-read from HBM, backward
            # recomputes the mixture (ops/gp_lstm_pallas.py; the lax.scan
            # fallback below costs ~+5 ms/step at the flagship geometry,
            # tools/gp_roofline.py).
            if g == 6 and reset_mask is None:
                import os as _os

                from ..ops.gp_lstm_pallas import gp6_layer_fused, gp6_pallas_ok
                from ..ops.kernel_gate import pallas_allowed

                if (
                    _os.environ.get("BAYESLM_PALLAS_GPLSTM", "1") != "0"
                    and pallas_allowed()
                    and self.gpnn.act_set == ("sigmoid", "tanh", "relu")
                    and gp6_pallas_ok(H, dtype, B)
                ):
                    ys, (hT, cT) = gp6_layer_fused(
                        xg, w, b, coef, h0, c0, step_mask=step_mask)
                    return ys, (hT, cT)
            if g in (1, 2, 3, 4):
                in_size = self.input_size
                w_x, w_h = w[:, :in_size], w[:, in_size:]
                gp_pre_x = x @ w_x.T.astype(dtype) + b.astype(dtype)
                drawn = (w_h, coef)

                # Gate-replacement fused recurrence (same treatment as
                # gate 6): W_hh and the GPNN's h-part concatenate into one
                # VMEM-resident (H, 5H) block, backward recomputes the
                # mixture (ops/gp_lstm_pallas.py gpg_layer_fused).
                if reset_mask is None:
                    import os as _os

                    from ..ops.gp_lstm_pallas import (gpg_layer_fused,
                                                      gpg_pallas_ok)
                    from ..ops.kernel_gate import pallas_allowed

                    if (
                        _os.environ.get("BAYESLM_PALLAS_GPLSTM", "1") != "0"
                        and pallas_allowed()
                        and gpg_pallas_ok(H, dtype, B)
                    ):
                        ys, (hT, cT) = gpg_layer_fused(
                            xg, gp_pre_x, self.weights_hh, self.bias_ih,
                            w_h, coef, h0, c0, g,
                            tuple(self.gpnn.act_set), step_mask=step_mask)
                        return ys, (hT, cT)
            elif g == 6:
                gp_pre_x = None  # gpnn(h) only
                drawn = (w, b, coef)
            elif g == 5:
                drawn = (w, b, coef)

        # Pre-read GPNN2 params into locals so the scan closure is pure (no
        # module-scope access inside the traced loop body).
        gpnn2_key = None
        gp2 = None
        if t == 4:
            if not deterministic:
                gpnn2_key = self.make_rng("sample")
            gp2 = (
                self.gpnn.frequency_mean,
                self.gpnn.frequency_lgstd,
                self.gpnn.coef_kernel,
                self.gpnn.coef_bias,
                self.gpnn.act_set,
                self.gpnn.n_mc_terms,
            )

        act_set = self.gpnn.act_set if hasattr(self, "gpnn") else ()

        def gp2_apply(v, step):
            if t != 4:
                return v
            f_mean, f_lgstd, ck, cb, acts, n_mc = gp2
            if gpnn2_key is None:
                freq = f_mean
            else:
                k = jax.random.fold_in(gpnn2_key, step)
                freq = f_mean + gaussian.sample_diff(k, f_lgstd)
            out = v @ freq.astype(v.dtype)
            acc = out  # skip connection
            from .layers import ACTS as _ACTS

            for act in acts:
                acc = acc + _ACTS[act](out)
            acc = acc / math.sqrt(n_mc)
            return acc @ ck.astype(v.dtype) + cb.astype(v.dtype)

        from .layers import ACTS

        def step_fn(carry, xg_t, gpx_t, step, m_t=None):
            h, c = carry
            if g == 6 and t <= 3:
                w, b, coef = drawn
                gates = xg_t + GPNN.apply_drawn(h, w, b, coef, act_set)
            else:
                gates = xg_t + h @ w_hh_t + b_ih
            i, f, gg, o = jnp.split(gates, 4, axis=-1)

            if t <= 3 and g in (1, 2, 3, 4):
                w_h, coef = drawn
                pre = gpx_t + h @ w_h.T.astype(dtype)
                gp_out = None
                for ai, act in enumerate(act_set):
                    term = ACTS[act](pre) * coef[ai].astype(dtype)
                    gp_out = term if gp_out is None else gp_out + term
                i = gp_out if g == 1 else jax.nn.sigmoid(i)
                f = gp_out if g == 2 else jax.nn.sigmoid(f)
                gg = gp_out if g == 3 else jnp.tanh(gg)
                o = gp_out if g == 4 else jax.nn.sigmoid(o)
            elif t == 4:
                i = gp2_apply(i, step) if g == 1 else jax.nn.sigmoid(i)
                f = gp2_apply(f, step) if g == 2 else jax.nn.sigmoid(f)
                gg = gp2_apply(gg, step) if g == 3 else jnp.tanh(gg)
                o = gp2_apply(o, step) if g == 4 else jax.nn.sigmoid(o)
            else:
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                gg = jnp.tanh(gg)

            if g == 5:
                if t <= 3:
                    w, b, coef = drawn
                    c = GPNN.apply_drawn(c, w, b, coef, act_set)
                else:
                    c = gp2_apply(c, step)

            cn = f * c + i * gg
            hn = o * jnp.tanh(cn)
            if m_t is not None:
                keep = m_t[:, None].astype(hn.dtype)
                hn = keep * hn + (1.0 - keep) * carry[0]
                cn = keep * cn + (1.0 - keep) * carry[1]
            return (hn, cn), hn

        steps = jnp.arange(T)
        gpx = gp_pre_x if gp_pre_x is not None else jnp.zeros((T, 1, 1), dtype=dtype)
        ms = step_mask if step_mask is not None else jnp.zeros((T, 0), dtype)
        rs = reset_mask if reset_mask is not None else jnp.zeros((T, 0), dtype)

        def body(carry, inp):
            xg_t, gpx_t, step, m_t, r_t = inp
            if reset_mask is not None:
                from ..ops.lstm import _apply_reset

                carry = (_apply_reset(carry[0], r_t, reset_src),
                         _apply_reset(carry[1], r_t, reset_src))
            return step_fn(carry, xg_t, gpx_t, step, m_t if step_mask is not None else None)

        (hT, cT), ys = jax.lax.scan(body, (h0, c0), (xg, gpx, steps, ms, rs))
        return ys, (hT, cT)

    def kl(self):
        return self.gpnn.kl() if hasattr(self, "gpnn") and self.gpnn_type <= 3 else jnp.asarray(0.0)


class GPLSTMCore(nn.Module):
    """GP-LSTM stack per the ``l_gauss_pos`` digit string.

    Reference: ``GPLSTM`` (model.py:1609-1681). digit0 = gate type (0 = all
    standard), digit1 = gpnn type; length 2 -> GP cell then standard layer,
    length 3 -> standard layer then GP cell, length 4 -> GP cells in both
    layers (digit2 = second cell's gate, digit3 unused).
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        s = cfg.l_gauss_pos
        H, E = cfg.nhid, cfg.emsize
        self.kind = "std" if int(s[0]) == 0 else f"len{len(s)}"
        if self.kind == "std":
            self.std_core = StandardRNNCore(cfg)
        elif self.kind == "len2":
            self.cell0 = GPLSTMCell(E, H, int(s[0]), int(s[1]), cfg.gp_sample)
            self.std1 = _StdLSTMLayer(H, H)
        elif self.kind == "len3":
            self.std0 = _StdLSTMLayer(E, H)
            self.cell1 = GPLSTMCell(H, H, int(s[0]), int(s[1]), cfg.gp_sample)
        else:  # len4
            self.cell0 = GPLSTMCell(E, H, int(s[0]), int(s[1]), cfg.gp_sample)
            self.cell1 = GPLSTMCell(H, H, int(s[2]), int(s[1]), cfg.gp_sample)

    def __call__(self, x, hidden: Hidden, deterministic: bool = True, step_mask=None,
                 reset_mask=None, reset_src=None):
        h0, c0 = hidden
        rkw = dict(reset_mask=reset_mask, reset_src=reset_src)
        if self.kind == "std":
            return self.std_core(x, hidden, deterministic, step_mask, **rkw)
        if self.kind == "len2":
            out0, (h_a, c_a) = self.cell0(x, (h0[0], c0[0]), deterministic, step_mask, **rkw)
            out1, h_b, c_b = self.std1(out0, h0[1], c0[1], step_mask,
                                       deterministic, **rkw)
            hs = (jnp.stack([h_a, h_b]), jnp.stack([c_a, c_b]))
            kls = [self._cell_kl(self.cell0)]
        elif self.kind == "len3":
            out0, h_a, c_a = self.std0(x, h0[0], c0[0], step_mask,
                                       deterministic, **rkw)
            out1, (h_b, c_b) = self.cell1(out0, (h0[1], c0[1]), deterministic, step_mask, **rkw)
            hs = (jnp.stack([h_a, h_b]), jnp.stack([c_a, c_b]))
            kls = [self._cell_kl(self.cell1)]
        else:
            out0, (h_a, c_a) = self.cell0(x, (h0[0], c0[0]), deterministic, step_mask, **rkw)
            out1, (h_b, c_b) = self.cell1(out0, (h0[1], c0[1]), deterministic, step_mask, **rkw)
            hs = (jnp.stack([h_a, h_b]), jnp.stack([c_a, c_b]))
            kls = [self._cell_kl(self.cell0), self._cell_kl(self.cell1)]

        # KL dispatch (train.py:366-376): only when gate digit > 0 and gpnn
        # type in 1..3.
        s = self.cfg.l_gauss_pos
        if int(s[0]) > 0 and 0 < int(s[1]) <= 3:
            for kl in kls:
                self.sow("losses", "kl", kl)
        return out1, hs

    @staticmethod
    def _cell_kl(cell: GPLSTMCell):
        return cell.kl()


class _StdLSTMLayer(nn.Module):
    """Single standard LSTM layer with its own params."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x, h0, c0, step_mask=None, deterministic: bool = True,
                 reset_mask=None, reset_src=None):
        p = _layer_params(self, "l", 4, self.input_size, self.hidden_size)
        # deterministic (eval/scoring) -> forward-only pallas recurrence;
        # grad paths take the custom-VJP train recurrence
        return lstm_layer(x, h0, c0, p, step_mask=step_mask,
                          allow_pallas=deterministic,
                          reset_mask=reset_mask, reset_src=reset_src)


class GaussLSTMLegacyCore(nn.Module):
    """Orphaned reference ``GaussLSTM`` (model.py:1369-1606), positions 0-8.

    Hand-rolled 2-layer LSTM at the posterior means with a deterministic
    type-0 GPNN substituted into layer 1 only:
      1-4: the (i, f, g, o) gate PRE-activation is replaced by gpnn(x_t) —
           the standard activation still applies afterwards except pos 3,
           whose cell gate takes gpnn(x_t) RAW (model.py:1580-1586);
      5: the previous cell state is transformed, c1 <- gpnn(c1);
      6: gates = x W_ih^T + b_ih + gpnn(h) (b_hh dropped, model.py:1532-1535);
      7: gates = gpnn(x) + h W_hh^T + b_hh (b_ih dropped, model.py:1537-1540).
    Position 8 is pos-3 behavior (the reference passes GPNN an unsupported
    ``deterministic=True`` kwarg there and crashes; type-0 GPNN is already
    deterministic, so 8 == 3 here). Requires emsize == nhid (the reference
    feeds the H-sized GPNN with the layer input). No sampling, no KL —
    matching the reference class, which no container ever constructs.
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        H, E = cfg.nhid, cfg.emsize
        pos = cfg.l_gauss_legacy_pos
        init = _rnn_param_init(H)
        self.weight_ih_mean_1 = self.param("weight_ih_mean_1", init, (4 * H, E))
        self.weight_hh_mean_1 = self.param("weight_hh_mean_1", init, (4 * H, H))
        self.bias_ih_mean_1 = self.param("bias_ih_mean_1", init, (4 * H,))
        self.bias_hh_mean_1 = self.param("bias_hh_mean_1", init, (4 * H,))
        self.weight_ih_mean_2 = self.param("weight_ih_mean_2", init, (4 * H, H))
        self.weight_hh_mean_2 = self.param("weight_hh_mean_2", init, (4 * H, H))
        self.bias_ih_mean_2 = self.param("bias_ih_mean_2", init, (4 * H,))
        self.bias_hh_mean_2 = self.param("bias_hh_mean_2", init, (4 * H,))
        if 1 <= pos <= 5 or pos == 8:
            self.gpnn = GPNN(H, H, act_set=("sigmoid", "tanh", "relu"))
        elif pos in (6, 7):
            self.gpnn = GPNN(H, 4 * H)

    def __call__(self, x, hidden: Hidden, deterministic: bool = True, step_mask=None,
                 reset_mask=None, reset_src=None):
        cfg = self.cfg
        H = cfg.nhid
        pos = cfg.l_gauss_legacy_pos
        dtype = x.dtype
        T, B, _ = x.shape
        h0, c0 = hidden

        w_ih1 = self.weight_ih_mean_1.T.astype(dtype)
        w_hh1 = self.weight_hh_mean_1.T.astype(dtype)
        b_ih1 = self.bias_ih_mean_1.astype(dtype)
        b_hh1 = self.bias_hh_mean_1.astype(dtype)

        # hoist all x-only work out of the scan
        if pos == 7:
            drawn = self.gpnn.draw(deterministic)
            xg = GPNN.apply_drawn(x, *drawn, self.gpnn.act_set)  # (T, B, 4H)
            add_bias = b_hh1
        elif pos == 6:
            xg = x @ w_ih1 + b_ih1
            add_bias = jnp.zeros_like(b_hh1)  # b_hh dropped (ref quirk)
            drawn6 = self.gpnn.draw(deterministic)
        else:
            xg = x @ w_ih1 + b_ih1
            add_bias = b_hh1
        gp_x = None
        if 1 <= pos <= 4 or pos == 8:
            d = self.gpnn.draw(deterministic)
            gp_x = GPNN.apply_drawn(x, *d, self.gpnn.act_set)  # (T, B, H)
        if pos == 5:
            drawn5 = self.gpnn.draw(deterministic)

        ms = step_mask if step_mask is not None else jnp.ones((T, B), dtype)
        gpx = gp_x if gp_x is not None else jnp.zeros((T, 1, 1), dtype)
        act5 = self.gpnn.act_set if pos == 5 else ()
        act6 = self.gpnn.act_set if pos == 6 else ()

        rs = reset_mask if reset_mask is not None else jnp.zeros((T, 0), dtype)

        def step(carry, inp):
            h1, c1 = carry
            xg_t, gpx_t, m_t, r_t = inp
            if reset_mask is not None:
                from ..ops.lstm import _apply_reset

                h1 = _apply_reset(h1, r_t, reset_src)
                c1 = _apply_reset(c1, r_t, reset_src)
            if pos == 6:
                gates = xg_t + GPNN.apply_drawn(h1, *drawn6, act6)
            else:
                gates = xg_t + h1 @ w_hh1 + add_bias
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            if pos == 1:
                i = gpx_t
            elif pos == 2:
                f = gpx_t
            elif pos == 4:
                o = gpx_t
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = gpx_t if pos in (3, 8) else jnp.tanh(g)
            c_eff = GPNN.apply_drawn(c1, *drawn5, act5) if pos == 5 else c1
            cn = f * c_eff + i * g
            hn = o * jnp.tanh(cn)
            keep = m_t[:, None].astype(hn.dtype)
            hn = keep * hn + (1.0 - keep) * h1
            cn = keep * cn + (1.0 - keep) * c1
            return (hn, cn), hn

        (h1T, c1T), ys1 = jax.lax.scan(step, (h0[0], c0[0]), (xg, gpx, ms, rs))

        # layer 2: standard LSTM over layer-1 outputs (model.py:1590-1600)
        p2 = LSTMParams(
            self.weight_ih_mean_2, self.weight_hh_mean_2,
            self.bias_ih_mean_2, self.bias_hh_mean_2,
        )
        ys2, h2T, c2T = lstm_layer(ys1, h0[1], c0[1], p2, step_mask=step_mask,
                                   allow_pallas=deterministic,
                                   reset_mask=reset_mask, reset_src=reset_src)
        return ys2, (jnp.stack([h1T, h2T]), jnp.stack([c1T, c2T]))


class VLSTMLegacyCore(nn.Module):
    """Orphaned reference ``VLSTM`` (model.py:2582-2733): a 2-layer LSTM at
    the posterior means whose WHOLE OUTPUT sequence receives additive noise
    eps * exp(hiddens_lgstd) during training, with trainable (32, H)
    posterior and prior tables (32 = the recipe batch size the reference's
    broadcast implicitly requires, model.py:2610-2613, :2728).

    Quirks kept: layer-2 w_ih has shape (4H, emsize) — NOT (4H, H)
    (model.py:2602; works because the recipes use emsize == nhid).
    ``kl(output)`` implements model.py:2664-2672 with an explicit hidden
    argument; the reference's ``self.hidden`` is never assigned (the write
    at :2727 is commented out), so its KL crashes — a latent bug. KL is
    sown when either l_v_pos digit is 1, mirroring the class's own gate.
    """

    cfg: ModelConfig
    noise_rows: int = 32

    def setup(self):
        cfg = self.cfg
        H, E = cfg.nhid, cfg.emsize
        init = _rnn_param_init(H)
        self.weight_ih_mean_1 = self.param("weight_ih_mean_1", init, (4 * H, E))
        self.weight_hh_mean_1 = self.param("weight_hh_mean_1", init, (4 * H, H))
        self.bias_ih_mean_1 = self.param("bias_ih_mean_1", init, (4 * H,))
        self.bias_hh_mean_1 = self.param("bias_hh_mean_1", init, (4 * H,))
        self.weight_ih_mean_2 = self.param("weight_ih_mean_2", init, (4 * H, E))
        self.weight_hh_mean_2 = self.param("weight_hh_mean_2", init, (4 * H, H))
        self.bias_ih_mean_2 = self.param("bias_ih_mean_2", init, (4 * H,))
        self.bias_hh_mean_2 = self.param("bias_hh_mean_2", init, (4 * H,))
        self.active = int(cfg.l_v_pos[0]) == 1 or int(cfg.l_v_pos[1]) == 1
        if self.active:
            R = self.noise_rows
            lg = gaussian.lgstd_init(1.0 / math.sqrt(cfg.nhid))
            self.hiddens_lgstd = self.param("hiddens_lgstd", lg, (R, H))
            self.hiddens_mean = self.param("hiddens_mean", init, (R, H))
            self.hiddens_lgstd_p = self.param("hiddens_lgstd_p", lg, (R, H))
            self.hiddens_mean_p = self.param("hiddens_mean_p", init, (R, H))

    def __call__(self, x, hidden: Hidden, deterministic: bool = True, step_mask=None,
                 reset_mask=None, reset_src=None):
        h0, c0 = hidden
        p1 = LSTMParams(
            self.weight_ih_mean_1, self.weight_hh_mean_1,
            self.bias_ih_mean_1, self.bias_hh_mean_1,
        )
        p2 = LSTMParams(
            self.weight_ih_mean_2, self.weight_hh_mean_2,
            self.bias_ih_mean_2, self.bias_hh_mean_2,
        )
        # lstm_stack2 falls back to two per-layer calls when the reference's
        # (4H, emsize) layer-2 shape quirk doesn't match (emsize != nhid)
        out, (h1T, h2T), (c1T, c2T) = lstm_stack2(
            x, h0, c0, p1, p2, step_mask=step_mask,
            allow_pallas=deterministic,
            reset_mask=reset_mask, reset_src=reset_src)

        if self.active:
            pre = out  # KL reads the PRE-noise output (model.py:2664-2672)
            if not deterministic:
                B = out.shape[1]
                assert B == self.noise_rows, (
                    f"legacy VLSTM noise table is ({self.noise_rows}, H); the "
                    f"reference's output += noise broadcast requires batch "
                    f"== {self.noise_rows}, got {B}"
                )
                eps = jax.random.normal(
                    self.make_rng("sample"), self.hiddens_lgstd.shape
                )
                out = out + (eps * jnp.exp(self.hiddens_lgstd)).astype(out.dtype)[None]
            # the commented-out write at :2727 stored the WHOLE output; the
            # (32, H) tables only broadcast against batch == 32 (same
            # implicit requirement as the noise add)
            if out.shape[1] == self.noise_rows:
                self.sow("losses", "kl", self.kl(pre))
            else:
                self.sow("losses", "kl", jnp.asarray(0.0))
        return out, (jnp.stack([h1T, h2T]), jnp.stack([c1T, c2T]))

    def kl(self, hidden):
        prior_mean = hidden * self.hiddens_mean_p
        return (
            jnp.mean(
                (hidden - prior_mean) ** 2.0
                - self.hiddens_lgstd * 2.0
                + jnp.exp(self.hiddens_lgstd * 2.0)
            )
            / 2.0
        )


class VLSTMCore(nn.Module):
    """Variational LSTM: two cells with optional per-timestep hidden noise.

    Reference: ``VariationalLSTM``/``VLSTMCell``/``VNN``
    (model.py:2426-2579). When a layer's ``l_v_pos`` digit is 1, the hidden
    state receives additive noise eps*exp(lgstd), eps ~ N(0, 0.1), at EVERY
    timestep, and the noised hidden feeds the recurrence. Gate bias quirk
    (bias_ih used twice) kept for parity (model.py:2519).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, hidden: Hidden, deterministic: bool = True, step_mask=None,
                 reset_mask=None, reset_src=None):
        cfg = self.cfg
        H = cfg.nhid
        h0, c0 = hidden
        out = x
        hs, cs = [], []
        T = x.shape[0]
        for l in range(2):
            in_size = cfg.emsize if l == 0 else cfg.nhid
            init = _rnn_param_init(H)
            w_ih = self.param(f"l{l}_weights_ih", init, (4 * H, in_size))
            b_ih = self.param(f"l{l}_bias_ih", tinit.zeros(), (4 * H,))
            w_hh = self.param(f"l{l}_weights_hh", init, (4 * H, H))
            _ = self.param(f"l{l}_bias_hh", tinit.zeros(), (4 * H,))  # unused (ref quirk)
            vnn = VNN(H, name=f"l{l}_vnn")
            vtype = int(cfg.l_v_pos[l])

            dtype = out.dtype
            xg = (out.reshape(T * out.shape[1], -1) @ w_ih.T.astype(dtype) + b_ih.astype(dtype)).reshape(
                T, out.shape[1], 4 * H
            )
            w_hh_t = w_hh.T.astype(dtype)

            if vtype == 1 and not deterministic:
                noise = vnn.noise(self.make_rng("sample"), T).astype(dtype)
            else:
                noise = jnp.zeros((T, 1, H), dtype=dtype)

            ms = step_mask if step_mask is not None else jnp.ones((T, out.shape[1]), dtype)
            rs = reset_mask if reset_mask is not None else jnp.zeros((T, 0), dtype)

            def step(carry, inp):
                h, c = carry
                xg_t, eps_t, m_t, r_t = inp
                if reset_mask is not None:
                    from ..ops.lstm import _apply_reset

                    h = _apply_reset(h, r_t, reset_src)
                    c = _apply_reset(c, r_t, reset_src)
                gates = xg_t + h @ w_hh_t + b_ih.astype(dtype)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                cn = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_pre = jax.nn.sigmoid(o) * jnp.tanh(cn)
                hn = h_pre + eps_t  # noise enters the recurrence
                keep = m_t[:, None].astype(hn.dtype)
                hn = keep * hn + (1.0 - keep) * h
                cn = keep * cn + (1.0 - keep) * c
                return (hn, cn), (hn, h_pre)

            (hT, cT), (ys, ys_pre) = jax.lax.scan(step, (h0[l], c0[l]), (xg, noise, ms, rs))
            out = ys
            hs.append(hT)
            cs.append(cT)

            # KL dispatch (train.py:377-385): per-layer when digit == 1. The
            # reference VNN stores the PRE-noise hidden of the last timestep
            # as "hidden_mean" (model.py:2573-2576).
            if vtype == 1:
                self.sow("losses", "kl", vnn.kl(ys_pre[-1]))

        return out, (jnp.stack(hs), jnp.stack(cs))


class RecurrentLM(nn.Module):
    """Embedding -> recurrent core -> tied decoder.

    Reference containers: RNNModel (model.py:23-73), BayesRNNModel (:179-229),
    GaussRNNModel (:1317-1366), VariationalRNNModel (:2373-2423). Dropout on
    the embedding output and on the core output; embedding/decoder init
    U(-0.1, 0.1); decoder bias zeros; weights tied when ``tied``.
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.embedding = self.param(
            "embedding", tinit.uniform(0.1), (cfg.vocab_size, cfg.emsize)
        )
        if not cfg.tied:
            self.decoder_w = self.param(
                "decoder_w", tinit.uniform(0.1), (cfg.vocab_size, cfg.nhid)
            )
        self.decoder_b = self.param("decoder_b", tinit.zeros(), (cfg.vocab_size,))
        self.drop = nn.Dropout(cfg.dropout)

        if cfg.uncertainty == "none":
            self.core = StandardRNNCore(cfg)
        elif cfg.uncertainty == "Bayesian":
            self.core = BayesLSTMCore(cfg)
        elif cfg.uncertainty == "Gaussian":
            if cfg.l_gauss_legacy_pos >= 0:
                self.core = GaussLSTMLegacyCore(cfg)
            else:
                self.core = GPLSTMCore(cfg)
        elif cfg.uncertainty == "Variational":
            self.core = VLSTMLegacyCore(cfg) if cfg.l_v_legacy else VLSTMCore(cfg)
        else:
            raise ValueError(cfg.uncertainty)

    def __call__(self, tokens, hidden: Hidden, deterministic: bool = True,
                 step_mask=None, return_hidden: bool = False,
                 reset_mask=None, reset_src=None, emb_in=None):
        """tokens: (T, B) int32 -> logits (T, B, V), new hidden.

        ``step_mask`` (T, B) freezes recurrent state on padded steps so the
        returned hidden equals the state at each stream's true length (used
        by the batched rescorer's exact carry-over). ``return_hidden=True``
        skips the vocabulary projection and returns the pre-decoder states
        (T, B, H) instead of logits — the fused decode+CE kernel
        (ops/ce_pallas.py) consumes these so the (T, B, V) logits never
        materialize.

        ``reset_mask`` (T, B) + ``reset_src`` (B,): packed-time carry-over
        (see ops/lstm.py lstm_layer) — supported by every recurrent core
        (standard, Bayesian, GP, Gaussian-legacy, variational).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        # ``emb_in``: precomputed embedding rows (T, B, E) — the tensor-
        # parallel shard_map train step embeds from its local vocab shard
        # (masked lookup + psum) and bypasses the full-table lookup here
        # (parallel/train_parallel.py).
        emb = (jnp.take(self.embedding, tokens, axis=0)
               if emb_in is None else emb_in).astype(dtype)
        emb = self.drop(emb, deterministic=deterministic)
        if reset_mask is not None:
            out, hidden = self.core(emb, hidden, deterministic, step_mask,
                                    reset_mask=reset_mask, reset_src=reset_src)
        else:
            out, hidden = self.core(emb, hidden, deterministic, step_mask)
        out = self.drop(out, deterministic=deterministic)
        if return_hidden:
            return out, hidden
        dec_w = self.embedding if cfg.tied else self.decoder_w
        logits = out @ dec_w.T.astype(dtype) + self.decoder_b.astype(dtype)
        return logits.astype(jnp.float32), hidden
