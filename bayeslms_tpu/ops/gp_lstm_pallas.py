"""Fused GP-LSTM (gate-6) train recurrence — custom-VJP Pallas kernel.

The GP activation cell (models/lstm_lm.py ``GPLSTMCell``; reference
``GPLSTMCell``/``GPNN``, model.py:1683-1906) with ``gate_type=6`` replaces
the hidden projection with a GP unit:

    gates_t = xg_t + sum_a coef_a * act_a(h_{t-1} @ W' + b')

with the GPNN mixture ``act_set = (sigmoid, tanh, relu)`` and one (W', b',
coef) sample per sequence. Run as a plain ``lax.scan`` this costs ~+5 ms
over the fused base LSTM at the flagship geometry: the scan re-reads the
8 MB W' from HBM every timestep in forward AND backward and stores
per-step autodiff residuals, while the activation mixture itself is free
(tools/gp_roofline.py: the 1-act variant times the same as 3-act within
tunnel noise). This kernel applies the same treatment as the standard
fused train recurrence (ops/lstm_pallas.py): W', b', coef stay
VMEM-resident across the whole sequence, the backward walks time in
reverse recomputing the mixture from (xg_t, h_{t-1}) instead of storing
it, and dW'/db'/dxg reduce to large MXU matmuls outside the kernel.
dcoef accumulates in a VMEM scratch across the reverse sweep.

Same quirk contract as the scan path: xg already carries ``b_ih`` once
and NO second bias is added (for gate 6 the GPNN owns the h-projection
bias; the reference's b_ih-twice quirk applies only to the standard
gates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lstm_pallas as lp

# Per-(step, row) elements of the time-walked blocks (H units):
# fwd: xg 4H + ys H + cs H; bwd: xg 4H + hprev/cprev/dy 3H + du_x 4H +
# du_pre 4H.
_ROWS_GP_FWD = 6
_ROWS_GP_BWD = 15


def _mixture(pre, c0, c1, c2):
    """sum_a coef_a * act_a(pre), GPNN default act order (s, t, r)."""
    s = jax.nn.sigmoid(pre)
    t = jnp.tanh(pre)
    r = jnp.maximum(pre, 0.0)
    return c0 * s + c1 * t + c2 * r, (s, t)


def _gp_fwd_kernel(xg_ref, w_ref, b_ref, coef_ref, mask_ref, h0_ref, c0_ref,
                   ys_ref, cs_ref, hT_ref, cT_ref, h_scr, c_scr,
                   *, TB: int, U: int):
    t_id = pl.program_id(0)

    @pl.when(t_id == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    dtype = ys_ref.dtype
    bg = b_ref[0].astype(jnp.float32)
    c0 = coef_ref[0].astype(jnp.float32)
    c1 = coef_ref[1].astype(jnp.float32)
    c2 = coef_ref[2].astype(jnp.float32)
    for u in range(U):
        pre = (
            jnp.dot(h.astype(dtype), w_ref[:],
                    preferred_element_type=jnp.float32) + bg
        )
        mix, _ = _mixture(pre, c0, c1, c2)
        gates = xg_ref[u].astype(jnp.float32) + mix
        H = gates.shape[-1] // 4
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H: 2 * H])
        g = jnp.tanh(gates[:, 2 * H: 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        keep = mask_ref[u][:, :1].astype(jnp.float32)
        h = keep * h_new + (1.0 - keep) * h
        c = keep * c_new + (1.0 - keep) * c
        ys_ref[u] = h.astype(dtype)
        cs_ref[u] = c.astype(dtype)
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(t_id == TB - 1)
    def _():
        hT_ref[:] = h.astype(dtype)
        cT_ref[:] = c.astype(dtype)


def _gp_bwd_kernel(xg_ref, hprev_ref, cprev_ref, dy_ref, mask_ref,
                   w_ref, b_ref, coef_ref, dhT_ref, dcT_ref,
                   dux_ref, dupre_ref, dcoef_ref, dh0_ref, dc0_ref,
                   dh_scr, dc_scr, dcoef_scr,
                   *, TB: int, U: int):
    tr = pl.program_id(0)

    @pl.when(tr == 0)
    def _():
        dh_scr[:] = dhT_ref[:].astype(jnp.float32)
        dc_scr[:] = dcT_ref[:].astype(jnp.float32)
        dcoef_scr[:] = jnp.zeros_like(dcoef_scr)

    dtype = dux_ref.dtype
    bg = b_ref[0].astype(jnp.float32)
    c0 = coef_ref[0].astype(jnp.float32)
    c1 = coef_ref[1].astype(jnp.float32)
    c2 = coef_ref[2].astype(jnp.float32)
    dh = dh_scr[:]
    dc = dc_scr[:]
    dc0a = dcoef_scr[0]
    dc1a = dcoef_scr[1]
    dc2a = dcoef_scr[2]
    for u in reversed(range(U)):
        h_prev = hprev_ref[u].astype(jnp.float32)
        c_prev = cprev_ref[u].astype(jnp.float32)
        keep = mask_ref[u][:, :1].astype(jnp.float32)

        # recompute this step's pre-activation, mixture, and gates
        pre = (
            jnp.dot(h_prev.astype(dtype), w_ref[:],
                    preferred_element_type=jnp.float32) + bg
        )
        s = jax.nn.sigmoid(pre)
        th = jnp.tanh(pre)
        r = jnp.maximum(pre, 0.0)
        mix = c0 * s + c1 * th + c2 * r
        gates = xg_ref[u].astype(jnp.float32) + mix
        H = gates.shape[-1] // 4
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H: 2 * H])
        g = jnp.tanh(gates[:, 2 * H: 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_cand = f * c_prev + i * g
        tc = jnp.tanh(c_cand)

        dh_tot = dh + dy_ref[u].astype(jnp.float32)
        dh_new = keep * dh_tot
        dc_new = keep * dc

        do = dh_new * tc
        dc_cand = dc_new + dh_new * o * (1.0 - tc * tc)
        di = dc_cand * g
        df = dc_cand * c_prev
        dg = dc_cand * i
        dc = dc_cand * f + (1.0 - keep) * dc

        du = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
             do * o * (1.0 - o)], axis=-1,
        )
        # gates = xg + mix -> d(xg) = du and d(mix) = du
        dc0a += jnp.sum(du * s, axis=0)
        dc1a += jnp.sum(du * th, axis=0)
        dc2a += jnp.sum(du * r, axis=0)
        dpre = du * (c0 * s * (1.0 - s) + c1 * (1.0 - th * th)
                     + c2 * (pre > 0.0).astype(jnp.float32))
        dh = jax.lax.dot_general(
            dpre.astype(dtype), w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + (1.0 - keep) * dh_tot
        dux_ref[u] = du.astype(dtype)
        dupre_ref[u] = dpre.astype(dtype)
    dh_scr[:] = dh
    dc_scr[:] = dc
    dcoef_scr[0] = dc0a
    dcoef_scr[1] = dc1a
    dcoef_scr[2] = dc2a

    @pl.when(tr == TB - 1)
    def _():
        dh0_ref[:] = dh.astype(dtype)
        dc0_ref[:] = dc.astype(dtype)
        dcoef_ref[:] = dcoef_scr[:]


@jax.jit
def _gp_fwd_run(xg, w_t, bg2, coef8, mask, h0, c0):
    T, B, G = xg.shape
    H = w_t.shape[0]
    dtype = xg.dtype
    U = lp._unroll(T, B, H, _ROWS_GP_FWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    return pl.pallas_call(
        functools.partial(_gp_fwd_kernel, TB=TB, U=U),
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((U, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=lp._COMPILER_PARAMS,
        interpret=lp._INTERPRET,
    )(xg, w_t, bg2, coef8, mask, h0, c0)


@jax.jit
def _gp_bwd_run(xg, hprev, cprev, dy, mask, w_t, bg2, coef8, dhT, dcT):
    T, B, G = xg.shape
    H = w_t.shape[0]
    dtype = xg.dtype
    U = lp._unroll(T, B, H, _ROWS_GP_BWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    rev = lambda t: (TB - 1 - t, 0, 0)
    return pl.pallas_call(
        functools.partial(_gp_bwd_kernel, TB=TB, U=U),
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((U, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 8), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, G), dtype),
            jax.ShapeDtypeStruct((T, B, G), dtype),
            jax.ShapeDtypeStruct((8, G), jnp.float32),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((8, G), jnp.float32),
        ],
        compiler_params=lp._COMPILER_PARAMS,
        interpret=lp._INTERPRET,
    )(xg, hprev, cprev, dy, mask, w_t, bg2, coef8, dhT, dcT)


@jax.custom_vjp
def gp6_scan_fused(xg, w_t, bg2, coef8, mask, h0, c0):
    """Differentiable fused GP gate-6 recurrence.

    xg: (T, B, 4H) = x @ W_ih^T + b_ih (b_ih once — gate-6 contract);
    w_t: (H, 4H) drawn GPNN weight, transposed; bg2: (1, 4H) drawn GPNN
    bias; coef8: (8, 4H) drawn mixture coefficients (rows 0-2 real,
    padded to the sublane count); mask: (T, B, 8). Returns (ys, cs, hT,
    cT) — callers must not consume cs (backward residual only).
    """
    return _gp_fwd_run(xg, w_t, bg2, coef8, mask, h0, c0)


def _gp6_fwd(xg, w_t, bg2, coef8, mask, h0, c0):
    ys, cs, hT, cT = _gp_fwd_run(xg, w_t, bg2, coef8, mask, h0, c0)
    return (ys, cs, hT, cT), (xg, w_t, bg2, coef8, mask, h0, c0, ys, cs)


def _gp6_bwd(res, grads):
    xg, w_t, bg2, coef8, mask, h0, c0, ys, cs = res
    dy, _dcs, dhT, dcT = grads
    dy = jnp.zeros_like(ys) if dy is None else dy
    dhT = jnp.zeros_like(ys[0]) if dhT is None else dhT
    dcT = jnp.zeros_like(ys[0]) if dcT is None else dcT
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    dux, dupre, dcoef8, dh0, dc0 = _gp_bwd_run(
        xg, hprev, cprev, dy, mask, w_t, bg2, coef8, dhT, dcT
    )
    T, B, G = dux.shape
    dupf = dupre.reshape(T * B, G).astype(jnp.float32)
    dw_t = (
        hprev.reshape(T * B, -1).astype(jnp.float32).T @ dupf
    ).astype(w_t.dtype)
    dbg = jnp.sum(dupf, axis=0, keepdims=True).astype(bg2.dtype)
    return (dux.astype(xg.dtype), dw_t, dbg, dcoef8.astype(coef8.dtype),
            None, dh0.astype(h0.dtype), dc0.astype(c0.dtype))


gp6_scan_fused.defvjp(_gp6_fwd, _gp6_bwd)


def gp6_pallas_ok(nhid: int, dtype, batch: int) -> bool:
    """Availability: TPU backend + resident W' fits + worst-case (U=1)
    block set within the scoped-VMEM budget (mirrors pallas_lstm_ok)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if nhid * 4 * nhid * itemsize > 8 * 1024 * 1024:
        return False
    if lp._est_vmem(1, batch, nhid, _ROWS_GP_BWD * nhid, itemsize) \
            > int(0.9 * lp._VMEM_LIMIT):
        return False
    return True


def gp6_layer_fused(xg, w, b, coef, h0, c0, step_mask=None):
    """Fused gate-6 GP layer over precomputed input projections.

    xg: (T, B, 4H); w: (4H, H) drawn GPNN weight (as stored); b: (4H,);
    coef: (k, 4H) with k = 3 mixture coefficients. Returns ys, (hT, cT).
    """
    dtype = xg.dtype
    T, B, G = xg.shape
    m2 = step_mask if step_mask is not None else jnp.ones((T, B))
    mask = jnp.broadcast_to(m2.astype(dtype)[:, :, None], (T, B, 8))
    coef8 = jnp.zeros((8, G), coef.dtype).at[:coef.shape[0]].set(coef)
    ys, _cs, hT, cT = gp6_scan_fused(
        xg, w.T.astype(dtype), b.astype(dtype).reshape(1, G),
        coef8.astype(jnp.float32), mask,
        h0.astype(dtype), c0.astype(dtype),
    )
    return ys, (hT, cT)


# =====================================================================
# Gate-REPLACEMENT variant (gate_type 1-4): the standard 4H gates still
# run (with the reference's b_ih-twice quirk), and ONE gate's H-slice is
# replaced by a GP unit over cat(x, h):
#
#   gates_t = xg_t + h @ W_hh + b_ih          (replaced slice dead)
#   pre_t   = gpx_t + h @ w_h                 (x part hoisted into gpx)
#   gate_g  = sum_a coef_a * act_a(pre_t)
#
# (models/lstm_lm.py GPLSTMCell step_fn, g in 1-4; reference
# model.py:1727-1762.) W_hh and w_h concatenate into ONE (H, 5H)
# VMEM-resident block so each step is a single MXU matmul; act_set is
# static per gate (g=2 uses (sigmoid,), others (sigmoid, tanh, relu)).
# =====================================================================

_ACT_F = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": lambda v: jnp.maximum(v, 0.0),
}
_ACT_D = {
    "sigmoid": lambda v, a: a * (1.0 - a),      # a = act(v)
    "tanh": lambda v, a: 1.0 - a * a,
    "relu": lambda v, a: (v > 0.0).astype(jnp.float32),
}
_ROWS_GPG_FWD = 7    # xg 4H + gpx H + ys H + cs H
_ROWS_GPG_BWD = 13   # xg 4H + gpx H + hprev/cprev/dy 3H + du5 5H


def _gpg_fwd_kernel(xg_ref, gpx_ref, w5_ref, bih_ref, coef_ref, mask_ref,
                    h0_ref, c0_ref, ys_ref, cs_ref, hT_ref, cT_ref,
                    h_scr, c_scr, *, TB: int, U: int, gate: int, acts):
    t_id = pl.program_id(0)

    @pl.when(t_id == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    dtype = ys_ref.dtype
    bih = bih_ref[0].astype(jnp.float32)
    coefs = [coef_ref[a].astype(jnp.float32) for a in range(len(acts))]
    for u in range(U):
        hw = jnp.dot(h.astype(dtype), w5_ref[:],
                     preferred_element_type=jnp.float32)
        H = hw.shape[-1] // 5
        gates = xg_ref[u].astype(jnp.float32) + hw[:, : 4 * H] + bih
        pre = gpx_ref[u].astype(jnp.float32) + hw[:, 4 * H:]
        gp = sum(cf * _ACT_F[a](pre) for cf, a in zip(coefs, acts))
        i = gp if gate == 1 else jax.nn.sigmoid(gates[:, :H])
        f = gp if gate == 2 else jax.nn.sigmoid(gates[:, H: 2 * H])
        g_ = gp if gate == 3 else jnp.tanh(gates[:, 2 * H: 3 * H])
        o = gp if gate == 4 else jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g_
        h_new = o * jnp.tanh(c_new)
        keep = mask_ref[u][:, :1].astype(jnp.float32)
        h = keep * h_new + (1.0 - keep) * h
        c = keep * c_new + (1.0 - keep) * c
        ys_ref[u] = h.astype(dtype)
        cs_ref[u] = c.astype(dtype)
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(t_id == TB - 1)
    def _():
        hT_ref[:] = h.astype(dtype)
        cT_ref[:] = c.astype(dtype)


def _gpg_bwd_kernel(xg_ref, gpx_ref, hprev_ref, cprev_ref, dy_ref, mask_ref,
                    w5_ref, bih_ref, coef_ref, dhT_ref, dcT_ref,
                    du5_ref, dcoef_ref, dh0_ref, dc0_ref,
                    dh_scr, dc_scr, dcoef_scr,
                    *, TB: int, U: int, gate: int, acts):
    tr = pl.program_id(0)

    @pl.when(tr == 0)
    def _():
        dh_scr[:] = dhT_ref[:].astype(jnp.float32)
        dc_scr[:] = dcT_ref[:].astype(jnp.float32)
        dcoef_scr[:] = jnp.zeros_like(dcoef_scr)

    dtype = du5_ref.dtype
    bih = bih_ref[0].astype(jnp.float32)
    coefs = [coef_ref[a].astype(jnp.float32) for a in range(len(acts))]
    dh = dh_scr[:]
    dc = dc_scr[:]
    dcoef_acc = [dcoef_scr[a] for a in range(len(acts))]
    for u in reversed(range(U)):
        h_prev = hprev_ref[u].astype(jnp.float32)
        c_prev = cprev_ref[u].astype(jnp.float32)
        keep = mask_ref[u][:, :1].astype(jnp.float32)

        hw = jnp.dot(h_prev.astype(dtype), w5_ref[:],
                     preferred_element_type=jnp.float32)
        H = hw.shape[-1] // 5
        gates = xg_ref[u].astype(jnp.float32) + hw[:, : 4 * H] + bih
        pre = gpx_ref[u].astype(jnp.float32) + hw[:, 4 * H:]
        avals = [_ACT_F[a](pre) for a in acts]
        gp = sum(cf * av for cf, av in zip(coefs, avals))
        i = gp if gate == 1 else jax.nn.sigmoid(gates[:, :H])
        f = gp if gate == 2 else jax.nn.sigmoid(gates[:, H: 2 * H])
        g_ = gp if gate == 3 else jnp.tanh(gates[:, 2 * H: 3 * H])
        o = gp if gate == 4 else jax.nn.sigmoid(gates[:, 3 * H:])
        c_cand = f * c_prev + i * g_
        tc = jnp.tanh(c_cand)

        dh_tot = dh + dy_ref[u].astype(jnp.float32)
        dh_new = keep * dh_tot
        dc_new = keep * dc

        do = dh_new * tc
        dc_cand = dc_new + dh_new * o * (1.0 - tc * tc)
        di = dc_cand * g_
        df = dc_cand * c_prev
        dg = dc_cand * i
        dc = dc_cand * f + (1.0 - keep) * dc

        zero = jnp.zeros_like(di)
        du_i = zero if gate == 1 else di * i * (1.0 - i)
        du_f = zero if gate == 2 else df * f * (1.0 - f)
        du_g = zero if gate == 3 else dg * (1.0 - g_ * g_)
        du_o = zero if gate == 4 else do * o * (1.0 - o)
        dgp = (di, df, dg, do)[gate - 1]
        for a_i, (av, a) in enumerate(zip(avals, acts)):
            dcoef_acc[a_i] = dcoef_acc[a_i] + jnp.sum(dgp * av, axis=0)
        dpre = dgp * sum(cf * _ACT_D[a](pre, av)
                         for cf, av, a in zip(coefs, avals, acts))
        du5 = jnp.concatenate([du_i, du_f, du_g, du_o, dpre], axis=-1)
        dh = jax.lax.dot_general(
            du5.astype(dtype), w5_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + (1.0 - keep) * dh_tot
        du5_ref[u] = du5.astype(dtype)
    dh_scr[:] = dh
    dc_scr[:] = dc
    for a_i in range(len(acts)):
        dcoef_scr[a_i] = dcoef_acc[a_i]

    @pl.when(tr == TB - 1)
    def _():
        dh0_ref[:] = dh.astype(dtype)
        dc0_ref[:] = dc.astype(dtype)
        dcoef_ref[:] = dcoef_scr[:]


@functools.lru_cache(maxsize=None)
def _make_gpg(gate: int, acts: tuple):
    """Per-(gate, act_set) custom-VJP callable (statics via closure)."""

    @jax.jit
    def fwd_run(xg, gpx, w5_t, bih2, coef8, mask, h0, c0):
        T, B, G = xg.shape
        H = G // 4
        dtype = xg.dtype
        U = lp._unroll(T, B, H, _ROWS_GPG_FWD, jnp.dtype(dtype).itemsize)
        TB = T // U
        return pl.pallas_call(
            functools.partial(_gpg_fwd_kernel, TB=TB, U=U, gate=gate,
                              acts=acts),
            grid=(TB,),
            in_specs=[
                pl.BlockSpec((U, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 5 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((U, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, H), dtype),
                jax.ShapeDtypeStruct((T, B, H), dtype),
                jax.ShapeDtypeStruct((B, H), dtype),
                jax.ShapeDtypeStruct((B, H), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            compiler_params=lp._COMPILER_PARAMS,
            interpret=lp._INTERPRET,
        )(xg, gpx, w5_t, bih2, coef8, mask, h0, c0)

    @jax.jit
    def bwd_run(xg, gpx, hprev, cprev, dy, mask, w5_t, bih2, coef8, dhT, dcT):
        T, B, G = xg.shape
        H = G // 4
        dtype = xg.dtype
        U = lp._unroll(T, B, H, _ROWS_GPG_BWD, jnp.dtype(dtype).itemsize)
        TB = T // U
        rev = lambda t: (TB - 1 - t, 0, 0)
        return pl.pallas_call(
            functools.partial(_gpg_bwd_kernel, TB=TB, U=U, gate=gate,
                              acts=acts),
            grid=(TB,),
            in_specs=[
                pl.BlockSpec((U, B, G), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((U, B, 8), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 5 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((U, B, 5 * H), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, 5 * H), dtype),
                jax.ShapeDtypeStruct((8, H), jnp.float32),
                jax.ShapeDtypeStruct((B, H), dtype),
                jax.ShapeDtypeStruct((B, H), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((8, H), jnp.float32),
            ],
            compiler_params=lp._COMPILER_PARAMS,
            interpret=lp._INTERPRET,
        )(xg, gpx, hprev, cprev, dy, mask, w5_t, bih2, coef8, dhT, dcT)

    @jax.custom_vjp
    def gpg(xg, gpx, w5_t, bih2, coef8, mask, h0, c0):
        return fwd_run(xg, gpx, w5_t, bih2, coef8, mask, h0, c0)

    def gpg_fwd(xg, gpx, w5_t, bih2, coef8, mask, h0, c0):
        ys, cs, hT, cT = fwd_run(xg, gpx, w5_t, bih2, coef8, mask, h0, c0)
        return (ys, cs, hT, cT), (xg, gpx, w5_t, bih2, coef8, mask, h0, c0,
                                  ys, cs)

    def gpg_bwd(res, grads):
        xg, gpx, w5_t, bih2, coef8, mask, h0, c0, ys, cs = res
        dy, _dcs, dhT, dcT = grads
        dy = jnp.zeros_like(ys) if dy is None else dy
        dhT = jnp.zeros_like(ys[0]) if dhT is None else dhT
        dcT = jnp.zeros_like(ys[0]) if dcT is None else dcT
        hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
        cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
        du5, dcoef8, dh0, dc0 = bwd_run(
            xg, gpx, hprev, cprev, dy, mask, w5_t, bih2, coef8, dhT, dcT)
        T, B, G5 = du5.shape
        G = 4 * (G5 // 5)
        du5f = du5.reshape(T * B, G5).astype(jnp.float32)
        dw5_t = (
            hprev.reshape(T * B, -1).astype(jnp.float32).T @ du5f
        ).astype(w5_t.dtype)
        dbih = jnp.sum(du5f[:, :G], axis=0, keepdims=True).astype(bih2.dtype)
        return (du5[:, :, :G].astype(xg.dtype),
                du5[:, :, G:].astype(gpx.dtype), dw5_t, dbih,
                dcoef8.astype(coef8.dtype), None,
                dh0.astype(h0.dtype), dc0.astype(c0.dtype))

    gpg.defvjp(gpg_fwd, gpg_bwd)
    return gpg


def gpg_layer_fused(xg, gpx, w_hh, b_ih, w_h, coef, h0, c0, gate: int,
                    acts, step_mask=None):
    """Fused gate-replacement GP layer (gate 1-4).

    xg: (T, B, 4H) = x @ W_ih^T + b_ih; gpx: (T, B, H) = x @ w_x^T + b_gpnn
    (the GPNN's cat(x,h) weight split, x part + bias hoisted);
    w_hh: (4H, H); b_ih: (4H,) — added AGAIN per step (the reference's
    b_ih-twice quirk); w_h: (H, H) the GPNN weight's h part; coef: (k, H).
    Returns ys, (hT, cT).
    """
    dtype = xg.dtype
    T, B, G = xg.shape
    H = G // 4
    m2 = step_mask if step_mask is not None else jnp.ones((T, B))
    mask = jnp.broadcast_to(m2.astype(dtype)[:, :, None], (T, B, 8))
    w5_t = jnp.concatenate(
        [w_hh.T.astype(dtype), w_h.T.astype(dtype)], axis=1)  # (H, 5H)
    coef8 = jnp.zeros((8, H), jnp.float32).at[:coef.shape[0]].set(
        coef.astype(jnp.float32))
    fn = _make_gpg(int(gate), tuple(acts))
    ys, _cs, hT, cT = fn(
        xg, gpx, w5_t, b_ih.astype(dtype).reshape(1, G), coef8, mask,
        h0.astype(dtype), c0.astype(dtype))
    return ys, (hT, cT)


def gpg_pallas_ok(nhid: int, dtype, batch: int) -> bool:
    """Availability for the gate-replacement kernel (resident (H, 5H))."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if nhid * 5 * nhid * itemsize > 10 * 1024 * 1024:
        return False
    if lp._est_vmem(1, batch, nhid, _ROWS_GPG_BWD * nhid, itemsize) \
            > int(0.9 * lp._VMEM_LIMIT):
        return False
    return True
