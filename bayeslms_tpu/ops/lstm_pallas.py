"""Pallas TPU kernel: fused LSTM layer with VMEM-resident recurrent weights.

Replaces the XLA `lax.scan` recurrence for inference/scoring. The scan
version re-reads W_hh (H x 4H, 8 MB at bf16 for H=1024) from HBM every
timestep — ~T x 8 MB of HBM traffic per layer per batch. This kernel walks
the time dimension as a sequential pallas grid, keeping W_hh (and the h/c
carry) resident in VMEM the whole time, so per-step HBM traffic drops to the
(B, 4H) input-projection slice and the (B, H) output row.

The input projection x @ W_ih^T + b_ih is still done OUTSIDE the kernel as
one large MXU matmul over all timesteps (see ops/lstm.py) — that part is
compute-bound and already optimal.

Forward-only by design: the training path keeps the differentiable scan
(XLA AD); scoring/eval (deterministic=True) routes here. Gate order [i,f,g,o]
matches torch/the reference (model.py:14-20).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped to True by tests (interpret mode) and by the fallback probe.
_INTERPRET = False


# Scoped-VMEM ceiling requested from Mosaic for these kernels (v5e has
# 128 MB VMEM/core; the default 16 MB cap is far too small for a
# double-buffered (U, B, 4H) gate block at scoring batch sizes).
_VMEM_LIMIT = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _est_vmem(U: int, B: int, H: int, row_elems: int, itemsize: int) -> int:
    """Upper-bound scoped-VMEM bytes for one grid step. ``row_elems`` is the
    total element count per (time-step, batch-row) across all time-walked
    operands/results — those blocks are double-buffered by the pipeline, as
    is the resident (H, 4H) W_hh block. Fixed terms: mask block, carries,
    fp32 scratch."""
    G = 4 * H
    seq = 2 * U * B * row_elems * itemsize          # double-buffered blocks
    whh = 2 * H * G * itemsize                      # resident, double-buffered
    fixed = (6 * B * H + G) * itemsize + 2 * B * H * 4 \
        + 2 * U * B * 8 * itemsize                  # h0/c0/hT/cT, bhh, scratch, mask
    return seq + whh + fixed


# Per-(step, row) elements of the time-walked blocks for each kernel variant
# (H units): fwd = xg 4H + ys H; train-fwd adds cs H; train-bwd walks
# xg 4H + hprev/cprev/dy 3H + du 4H.
_ROWS_FWD = 5
_ROWS_TRAIN_FWD = 6
_ROWS_TRAIN_BWD = 11


def _unroll(T: int, B: int, H: int, rows_h: int, itemsize: int) -> int:
    """Time-unroll factor: several sequential LSTM steps per grid iteration
    amortize the per-grid-step fixed cost (pipeline bookkeeping, semaphores,
    carry loads) that dominates the latency-bound recurrence at small batch.
    Measured on v5e (H=1024, B=32, T=100): U=5 cuts the fused train step
    ~frac of the recurrence overhead. The factor is capped so the
    double-buffered blocks fit the scoped-VMEM budget at the given batch
    (scoring batches reach hundreds of rows)."""
    import os

    forced = os.environ.get("BAYESLM_LSTM_UNROLL")
    if forced:  # diagnostic override; still must divide T
        u = int(forced)
        if u >= 1 and T % u == 0:
            return u
    budget = int(0.9 * _VMEM_LIMIT)
    for u in (8, 5, 4, 2):
        if T % u == 0 and _est_vmem(u, B, H, rows_h * H, itemsize) <= budget:
            return u
    return 1


def _cell_step(xg_row, h, c, keep, whh_ref, bhh, dtype):
    """One LSTM time step in fp32 activations (bf16 MXU matmul)."""
    gates = (
        xg_row.astype(jnp.float32)
        + jnp.dot(h.astype(dtype), whh_ref[:], preferred_element_type=jnp.float32)
        + bhh
    )
    H = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    if keep is not None:
        h_new = keep * h_new + (1.0 - keep) * h
        c_new = keep * c_new + (1.0 - keep) * c
    return h_new, c_new


def _kernel(xg_ref, whh_ref, bhh_ref, mask_ref, h0_ref, c0_ref,
            ys_ref, hT_ref, cT_ref, h_scr, c_scr,
            *, TB: int, U: int, masked: bool):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    # Gates and nonlinearities run in fp32 (Mosaic's transcendentals want a
    # uniform element type; fp32 also keeps the carried cell state accurate),
    # while the MXU matmul consumes the bf16 weight block directly. U
    # sequential steps run per grid iteration (see _unroll).
    h = h_scr[:]
    c = c_scr[:]
    dtype = ys_ref.dtype
    bhh = bhh_ref[0].astype(jnp.float32)
    for u in range(U):
        keep = mask_ref[u][:, :1].astype(jnp.float32) if masked else None
        h, c = _cell_step(xg_ref[u], h, c, keep, whh_ref, bhh, dtype)
        ys_ref[u] = h.astype(dtype)
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(t == TB - 1)
    def _():
        hT_ref[:] = h.astype(dtype)
        cT_ref[:] = c.astype(dtype)


def _kernel_reset(xg_ref, whh_ref, bhh_ref, mask_ref, rst_ref, pmat_ref,
                  h0_ref, c0_ref, ys_ref, hT_ref, cT_ref, h_scr, c_scr,
                  *, TB: int, U: int, masked: bool):
    """Forward kernel with packed-time carry-over: before step t, columns
    with reset 1 take the state of their chain's source column via the
    0/1 selection matrix P (one (B, B) x (B, H) MXU matmul — exact, each
    output row has a single 1-weighted term)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    dtype = ys_ref.dtype
    bhh = bhh_ref[0].astype(jnp.float32)
    for u in range(U):
        r = rst_ref[u][:, :1].astype(jnp.float32)
        hb = jnp.dot(pmat_ref[:], h.astype(dtype),
                     preferred_element_type=jnp.float32)
        cb = jnp.dot(pmat_ref[:], c.astype(dtype),
                     preferred_element_type=jnp.float32)
        h = (1.0 - r) * h + r * hb
        c = (1.0 - r) * c + r * cb
        keep = mask_ref[u][:, :1].astype(jnp.float32) if masked else None
        h, c = _cell_step(xg_ref[u], h, c, keep, whh_ref, bhh, dtype)
        ys_ref[u] = h.astype(dtype)
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(t == TB - 1)
    def _():
        hT_ref[:] = h.astype(dtype)
        cT_ref[:] = c.astype(dtype)


@functools.partial(jax.jit, static_argnames=("masked",))
def _run_reset(xg, w_hh_t, b_hh, mask, rst, pmat, h0, c0, masked: bool):
    T, B, G = xg.shape
    H = G // 4
    dtype = xg.dtype
    U = _unroll(T, B, H, _ROWS_FWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    kernel = functools.partial(_kernel_reset, TB=TB, U=U, masked=masked)
    ys, hT, cT = pl.pallas_call(
        kernel,
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((U, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(xg, w_hh_t, b_hh, mask, rst, pmat, h0, c0)
    return ys, hT, cT


@functools.partial(jax.jit, static_argnames=("masked",))
def _run(xg, w_hh_t, b_hh, mask, h0, c0, masked: bool):
    T, B, G = xg.shape
    H = G // 4
    dtype = xg.dtype
    U = _unroll(T, B, H, _ROWS_FWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    kernel = functools.partial(_kernel, TB=TB, U=U, masked=masked)
    grid = (TB,)
    ys, hT, cT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((U, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),  # h carry (fp32 for stability)
            pltpu.VMEM((B, H), jnp.float32),  # c carry
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(xg, w_hh_t, b_hh, mask, h0, c0)
    return ys, hT, cT


def lstm_layer_pallas(
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    w_ih: jax.Array,  # (4H, in) torch layout
    w_hh: jax.Array,  # (4H, H)
    b_ih: jax.Array,
    b_hh: jax.Array,
    step_mask: Optional[jax.Array] = None,
    reset_mask: Optional[jax.Array] = None,
    reset_src: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(T, B, in) -> (T, B, H), hT, cT. Forward-only fused recurrence.

    ``reset_mask`` (T, B) + ``reset_src`` (B,): packed-time carry-over — at
    reset steps each column's (h, c) is replaced by its source column's
    state before the cell step (see ops/lstm.py lstm_layer)."""
    dtype = x.dtype
    T, B, _ = x.shape
    H = w_hh.shape[1]
    xg = (
        x.reshape(T * B, -1) @ w_ih.T.astype(dtype) + b_ih.astype(dtype)
    ).reshape(T, B, 4 * H)
    # Mosaic block constraint: pack the (T, B) step mask as (T, B, 8) so the
    # per-step block (1, B, 8) has legal trailing dims.
    m2 = step_mask if step_mask is not None else jnp.ones((T, B))
    mask = jnp.broadcast_to(m2.astype(dtype)[:, :, None], (T, B, 8))
    if reset_mask is not None:
        rst = jnp.broadcast_to(reset_mask.astype(dtype)[:, :, None], (T, B, 8))
        pmat = (reset_src[:, None] == jnp.arange(B)[None, :]).astype(dtype)
        return _run_reset(
            xg, w_hh.T.astype(dtype), b_hh.astype(dtype).reshape(1, 4 * H),
            mask, rst, pmat, h0.astype(dtype), c0.astype(dtype),
            step_mask is not None,
        )
    return _run(
        xg,
        w_hh.T.astype(dtype),
        b_hh.astype(dtype).reshape(1, 4 * H),
        mask,
        h0.astype(dtype),
        c0.astype(dtype),
        step_mask is not None,
    )


# =====================================================================
# Training path: fused LSTM layer with a custom VJP (VERDICT item 10).
#
# The XLA scan's backward re-reads W_hh from HBM every timestep (like the
# forward) and stores per-step residuals. Here forward ALSO emits the cell
# sequence, and the backward walks time in REVERSE as a sequential pallas
# grid with W_hh and the (dh, dc) carries VMEM-resident, recomputing the
# gate activations from (xg_t, h_{t-1}) instead of storing them. The kernel
# emits du (gate pre-activation grads); dW_hh / db_hh / dW_ih / db_ih / dx
# reduce to large MXU matmuls OUTSIDE the kernel.
# =====================================================================


def _train_fwd_kernel(xg_ref, whh_ref, bhh_ref, mask_ref, h0_ref, c0_ref,
                      ys_ref, cs_ref, hT_ref, cT_ref, h_scr, c_scr,
                      *, TB: int, U: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    dtype = ys_ref.dtype
    bhh = bhh_ref[0].astype(jnp.float32)
    for u in range(U):
        keep = mask_ref[u][:, :1].astype(jnp.float32)
        h, c = _cell_step(xg_ref[u], h, c, keep, whh_ref, bhh, dtype)
        ys_ref[u] = h.astype(dtype)
        cs_ref[u] = c.astype(dtype)
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(t == TB - 1)
    def _():
        hT_ref[:] = h.astype(dtype)
        cT_ref[:] = c.astype(dtype)


def _train_bwd_kernel(xg_ref, hprev_ref, cprev_ref, dy_ref, mask_ref,
                      whh_ref, bhh_ref, dhT_ref, dcT_ref,
                      du_ref, dh0_ref, dc0_ref, dh_scr, dc_scr,
                      *, TB: int, U: int):
    # grid walks time BACKWARD in U-step blocks (block map TB-1-tr); rows
    # within a block are in forward time order, so u runs U-1 .. 0.
    tr = pl.program_id(0)

    @pl.when(tr == 0)
    def _():
        dh_scr[:] = dhT_ref[:].astype(jnp.float32)
        dc_scr[:] = dcT_ref[:].astype(jnp.float32)

    dtype = du_ref.dtype
    bhh = bhh_ref[0].astype(jnp.float32)
    dh = dh_scr[:]
    dc = dc_scr[:]
    for u in reversed(range(U)):
        h_prev = hprev_ref[u].astype(jnp.float32)
        c_prev = cprev_ref[u].astype(jnp.float32)
        keep = mask_ref[u][:, :1].astype(jnp.float32)

        # recompute this step's gate activations and candidate cell
        gates = (
            xg_ref[u].astype(jnp.float32)
            + jnp.dot(h_prev.astype(dtype), whh_ref[:],
                      preferred_element_type=jnp.float32)
            + bhh
        )
        H = gates.shape[-1] // 4
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_cand = f * c_prev + i * g
        tc = jnp.tanh(c_cand)

        dh_tot = dh + dy_ref[u].astype(jnp.float32)
        dc_tot = dc
        dh_new = keep * dh_tot
        dc_new = keep * dc_tot

        do = dh_new * tc
        dc_cand = dc_new + dh_new * o * (1.0 - tc * tc)
        di = dc_cand * g
        df = dc_cand * c_prev
        dg = dc_cand * i
        dc = dc_cand * f + (1.0 - keep) * dc_tot

        du = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
             do * o * (1.0 - o)], axis=-1,
        )
        # dh_prev: du @ W_hh (contract the 4H axis of the resident block)
        dh = jax.lax.dot_general(
            du.astype(dtype), whh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + (1.0 - keep) * dh_tot
        du_ref[u] = du.astype(dtype)
    dh_scr[:] = dh
    dc_scr[:] = dc

    @pl.when(tr == TB - 1)
    def _():
        dh0_ref[:] = dh.astype(dtype)
        dc0_ref[:] = dc.astype(dtype)


@jax.jit
def _train_fwd_run(xg, w_hh_t, b_hh, mask, h0, c0):
    T, B, G = xg.shape
    H = G // 4
    dtype = xg.dtype
    U = _unroll(T, B, H, _ROWS_TRAIN_FWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    return pl.pallas_call(
        functools.partial(_train_fwd_kernel, TB=TB, U=U),
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((U, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
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
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(xg, w_hh_t, b_hh, mask, h0, c0)


@jax.jit
def _train_bwd_run(xg, hprev, cprev, dy, mask, w_hh_t, b_hh, dhT, dcT):
    T, B, G = xg.shape
    H = G // 4
    dtype = xg.dtype
    U = _unroll(T, B, H, _ROWS_TRAIN_BWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    rev = lambda t: (TB - 1 - t, 0, 0)  # U-step blocks, walked backward
    return pl.pallas_call(
        functools.partial(_train_bwd_kernel, TB=TB, U=U),
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((U, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 8), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, G), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        # the resident (H, 4H) W_hh block gets double-buffered by the
        # pipeline (8 MB x2 at H=1024), pushing past the default 16 MB
        # scoped-vmem cap; v5e has headroom above it
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(xg, hprev, cprev, dy, mask, w_hh_t, b_hh, dhT, dcT)


@jax.custom_vjp
def lstm_scan_fused(xg, w_hh_t, b_hh2, mask, h0, c0):
    """Differentiable fused LSTM recurrence over precomputed input
    projections. xg: (T, B, 4H) = x@W_ih^T + b_ih; w_hh_t: (H, 4H);
    b_hh2: (1, 4H); mask: (T, B, 8). Returns (ys, cs, hT, cT)."""
    return _train_fwd_run(xg, w_hh_t, b_hh2, mask, h0, c0)


def _lsf_fwd(xg, w_hh_t, b_hh2, mask, h0, c0):
    ys, cs, hT, cT = _train_fwd_run(xg, w_hh_t, b_hh2, mask, h0, c0)
    return (ys, cs, hT, cT), (xg, w_hh_t, b_hh2, mask, h0, c0, ys, cs)


def _lsf_bwd(res, grads):
    xg, w_hh_t, b_hh2, mask, h0, c0, ys, cs = res
    dy, dcs, dhT, dcT = grads
    # dcs (grad w.r.t. the cell sequence) is unused by all callers; fold any
    # nonzero into nothing — callers must not consume cs. dy may be a zero
    # cotangent object; normalize.
    dy = jnp.zeros_like(ys) if dy is None else dy
    dhT = jnp.zeros_like(ys[0]) if dhT is None else dhT
    dcT = jnp.zeros_like(ys[0]) if dcT is None else dcT
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    du, dh0, dc0 = _train_bwd_run(
        xg, hprev, cprev, dy, mask, w_hh_t, b_hh2, dhT, dcT
    )
    duf = du.astype(jnp.float32)
    # dW_hh^T (H, 4H): gates += h_prev @ W_hh^T  =>  d(W_hh^T) = hprev^T @ du
    T, B, G = du.shape
    dw = (
        hprev.reshape(T * B, -1).astype(jnp.float32).T @ duf.reshape(T * B, G)
    ).astype(w_hh_t.dtype)
    db = jnp.sum(duf, axis=(0, 1), keepdims=False).reshape(1, G).astype(b_hh2.dtype)
    return du.astype(xg.dtype), dw, db, None, dh0.astype(h0.dtype), dc0.astype(c0.dtype)


lstm_scan_fused.defvjp(_lsf_fwd, _lsf_bwd)


def lstm_layer_pallas_train(
    x, h0, c0, w_ih, w_hh, b_ih, b_hh, step_mask=None,
):
    """Differentiable fused LSTM layer (training path). Same contract as
    ops.lstm.lstm_layer: (T, B, in) -> (T, B, H), hT, cT."""
    dtype = x.dtype
    T, B, _ = x.shape
    H = w_hh.shape[1]
    xg = (
        x.reshape(T * B, -1) @ w_ih.T.astype(dtype) + b_ih.astype(dtype)
    ).reshape(T, B, 4 * H)
    m2 = step_mask if step_mask is not None else jnp.ones((T, B))
    mask = jnp.broadcast_to(m2.astype(dtype)[:, :, None], (T, B, 8))
    ys, _cs, hT, cT = lstm_scan_fused(
        xg, w_hh.T.astype(dtype), b_hh.astype(dtype).reshape(1, 4 * H),
        mask, h0.astype(dtype), c0.astype(dtype),
    )
    return ys, hT, cT


def pallas_lstm_ok(nhid: int, dtype, batch: Optional[int] = None,
                   train: bool = False) -> bool:
    """Conservative availability gate: TPU backend + W_hh fits VMEM. With
    ``batch``, also require the worst-case (U=1) block set to fit the
    scoped-VMEM budget — huge scoring batches must fall back to the scan."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    whh_bytes = nhid * 4 * nhid * itemsize
    if whh_bytes > 8 * 1024 * 1024:
        return False
    if batch is not None:
        rows = _ROWS_TRAIN_BWD if train else _ROWS_FWD
        if _est_vmem(1, batch, nhid, rows * nhid, itemsize) > int(0.9 * _VMEM_LIMIT):
            return False
    return True
