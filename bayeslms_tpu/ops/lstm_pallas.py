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


def _est_vmem(U: int, B: int, H: int, row_elems: int, itemsize: int,
              reset: bool = False) -> int:
    """Upper-bound scoped-VMEM bytes for one grid step. ``row_elems`` is the
    total element count per (time-step, batch-row) across all time-walked
    operands/results — those blocks are double-buffered by the pipeline, as
    is the resident (H, 4H) W_hh block. Fixed terms: mask block, carries,
    fp32 scratch. The reset kernel adds a second (U, B, 8) time-walked block
    (rst events) and the resident (B, B) selection matrix."""
    G = 4 * H
    seq = 2 * U * B * row_elems * itemsize          # double-buffered blocks
    whh = 2 * H * G * itemsize                      # resident, double-buffered
    fixed = (6 * B * H + G) * itemsize + 2 * B * H * 4 \
        + 2 * U * B * 8 * itemsize                  # h0/c0/hT/cT, bhh, scratch, mask
    if reset:
        fixed += 2 * B * B * itemsize + 2 * U * B * 8 * itemsize
    return seq + whh + fixed


# Per-(step, row) elements of the time-walked blocks for each kernel variant
# (H units): fwd = xg 4H + ys H; train-fwd adds cs H; train-bwd walks
# xg 4H + hprev/cprev/dy 3H + du 4H.
_ROWS_FWD = 5
_ROWS_TRAIN_FWD = 6
_ROWS_TRAIN_BWD = 11


def _unroll(T: int, B: int, H: int, rows_h: int, itemsize: int,
            reset: bool = False) -> int:
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
        if T % u == 0 and _est_vmem(u, B, H, rows_h * H, itemsize, reset) <= budget:
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
    U = _unroll(T, B, H, _ROWS_FWD, jnp.dtype(dtype).itemsize, reset=True)
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


# =====================================================================
# Fused TWO-LAYER LSTM: both stacked layers run inside ONE sequential
# pallas grid. The reference's hot path is a 2-layer `_VF.lstm`
# (model.py:41-46, nlayers=2 in every recipe); running the layers as two
# separate kernels costs 2x the sequential grid iterations plus an HBM
# round-trip of the inter-layer activation (T, B, H) and a separate
# (T*B, H) x (H, 4H) input projection for layer 2. Here layer 2's step t
# runs right after layer 1's step t in the same iteration: the h1 ->
# xg2 projection happens on the MXU against a VMEM-resident W_ih2, the
# inter-layer activation never leaves VMEM, and the sequential iteration
# count halves. W_hh1, W_ih2, W_hh2 all stay VMEM-resident.
# =====================================================================

_ROWS2_FWD = 5          # xg1 4H + ys2 H
_ROWS2_TRAIN_FWD = 9    # xg1 4H + dmask H + ys1/cs1/ys2/cs2
_ROWS2_TRAIN_BWD = 20   # xg1 4H + ys1/dm/h1p/c1p/h2p/c2p/dy1/dy2 + du1/du2 8H


def _est_vmem2(U: int, B: int, H: int, row_elems: int, itemsize: int,
               reset: bool = False) -> int:
    """Scoped-VMEM upper bound for the fused 2-layer kernels: THREE
    double-buffered resident (H, 4H) weight blocks instead of one."""
    G = 4 * H
    seq = 2 * U * B * row_elems * itemsize
    res = 3 * 2 * H * G * itemsize
    fixed = (12 * B * H + 3 * G) * itemsize + 4 * B * H * 4 \
        + 2 * U * B * 8 * itemsize
    if reset:
        fixed += 2 * B * B * itemsize + 2 * U * B * 8 * itemsize
    return seq + res + fixed


def _unroll2(T: int, B: int, H: int, rows_h: int, itemsize: int,
             reset: bool = False) -> int:
    import os

    forced = os.environ.get("BAYESLM_LSTM_UNROLL")
    if forced:
        u = int(forced)
        if u >= 1 and T % u == 0:
            return u
    budget = int(0.9 * _VMEM_LIMIT)
    for u in (8, 5, 4, 2):
        if T % u == 0 and _est_vmem2(u, B, H, rows_h * H, itemsize, reset) <= budget:
            return u
    return 1


def _cell2_steps(xg1_row, h1, c1, h2, c2, keep, whh1_ref, bhh1,
                 wih2_ref, whh2_ref, b2, dtype, dm_row=None):
    """Layer-1 cell step at time t immediately followed by layer-2's: the
    inter-layer projection h1_t @ W_ih2 runs on the MXU against the resident
    block. ``b2`` = b_ih2 + b_hh2 (one combined bias). ``dm_row`` is the
    inter-layer (inverted) dropout mask row — torch nn.LSTM drops every
    layer's output except the last."""
    h1, c1 = _cell_step(xg1_row, h1, c1, keep, whh1_ref, bhh1, dtype)
    h1d = h1 if dm_row is None else h1 * dm_row
    xg2 = jnp.dot(h1d.astype(dtype), wih2_ref[:], preferred_element_type=jnp.float32)
    h2, c2 = _cell_step(xg2, h2, c2, keep, whh2_ref, b2, dtype)
    return h1, c1, h2, c2


def _kernel2(xg1_ref, whh1_ref, bhh1_ref, wih2_ref, whh2_ref, b2_ref,
             mask_ref, h01_ref, c01_ref, h02_ref, c02_ref,
             ys_ref, hT1_ref, cT1_ref, hT2_ref, cT2_ref,
             h1_scr, c1_scr, h2_scr, c2_scr,
             *, TB: int, U: int, masked: bool):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h1_scr[:] = h01_ref[:].astype(jnp.float32)
        c1_scr[:] = c01_ref[:].astype(jnp.float32)
        h2_scr[:] = h02_ref[:].astype(jnp.float32)
        c2_scr[:] = c02_ref[:].astype(jnp.float32)

    h1, c1, h2, c2 = h1_scr[:], c1_scr[:], h2_scr[:], c2_scr[:]
    dtype = ys_ref.dtype
    bhh1 = bhh1_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    for u in range(U):
        keep = mask_ref[u][:, :1].astype(jnp.float32) if masked else None
        h1, c1, h2, c2 = _cell2_steps(
            xg1_ref[u], h1, c1, h2, c2, keep, whh1_ref, bhh1,
            wih2_ref, whh2_ref, b2, dtype)
        ys_ref[u] = h2.astype(dtype)
    h1_scr[:], c1_scr[:], h2_scr[:], c2_scr[:] = h1, c1, h2, c2

    @pl.when(t == TB - 1)
    def _():
        hT1_ref[:] = h1.astype(dtype)
        cT1_ref[:] = c1.astype(dtype)
        hT2_ref[:] = h2.astype(dtype)
        cT2_ref[:] = c2.astype(dtype)


def _kernel2_reset(xg1_ref, whh1_ref, bhh1_ref, wih2_ref, whh2_ref, b2_ref,
                   mask_ref, rst_ref, pmat_ref,
                   h01_ref, c01_ref, h02_ref, c02_ref,
                   ys_ref, hT1_ref, cT1_ref, hT2_ref, cT2_ref,
                   h1_scr, c1_scr, h2_scr, c2_scr,
                   *, TB: int, U: int, masked: bool):
    """Fused 2-layer forward with packed-time carry-over resets (see
    _kernel_reset): both layers' states take their chain-source column's
    state at reset steps."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h1_scr[:] = h01_ref[:].astype(jnp.float32)
        c1_scr[:] = c01_ref[:].astype(jnp.float32)
        h2_scr[:] = h02_ref[:].astype(jnp.float32)
        c2_scr[:] = c02_ref[:].astype(jnp.float32)

    h1, c1, h2, c2 = h1_scr[:], c1_scr[:], h2_scr[:], c2_scr[:]
    dtype = ys_ref.dtype
    bhh1 = bhh1_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    for u in range(U):
        r = rst_ref[u][:, :1].astype(jnp.float32)

        def bsel(s):
            sb = jnp.dot(pmat_ref[:], s.astype(dtype),
                         preferred_element_type=jnp.float32)
            return (1.0 - r) * s + r * sb

        h1, c1, h2, c2 = bsel(h1), bsel(c1), bsel(h2), bsel(c2)
        keep = mask_ref[u][:, :1].astype(jnp.float32) if masked else None
        h1, c1, h2, c2 = _cell2_steps(
            xg1_ref[u], h1, c1, h2, c2, keep, whh1_ref, bhh1,
            wih2_ref, whh2_ref, b2, dtype)
        ys_ref[u] = h2.astype(dtype)
    h1_scr[:], c1_scr[:], h2_scr[:], c2_scr[:] = h1, c1, h2, c2

    @pl.when(t == TB - 1)
    def _():
        hT1_ref[:] = h1.astype(dtype)
        cT1_ref[:] = c1.astype(dtype)
        hT2_ref[:] = h2.astype(dtype)
        cT2_ref[:] = c2.astype(dtype)


@functools.partial(jax.jit, static_argnames=("masked", "has_reset"))
def _run2(xg1, whh1_t, bhh1, wih2_t, whh2_t, b2, mask, rst, pmat,
          h01, c01, h02, c02, masked: bool, has_reset: bool):
    T, B, G = xg1.shape
    H = G // 4
    dtype = xg1.dtype
    U = _unroll2(T, B, H, _ROWS2_FWD, jnp.dtype(dtype).itemsize, reset=has_reset)
    TB = T // U
    walk = lambda n: pl.BlockSpec((U, B, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda t: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        walk(G), full(H, G), full(1, G), full(H, G), full(H, G), full(1, G),
        walk(8),
    ]
    args = [xg1, whh1_t, bhh1, wih2_t, whh2_t, b2, mask]
    if has_reset:
        in_specs += [walk(8), full(B, B)]
        args += [rst, pmat]
        kernel = functools.partial(_kernel2_reset, TB=TB, U=U, masked=masked)
    else:
        kernel = functools.partial(_kernel2, TB=TB, U=U, masked=masked)
    in_specs += [full(B, H)] * 4
    args += [h01, c01, h02, c02]
    ys, hT1, cT1, hT2, cT2 = pl.pallas_call(
        kernel,
        grid=(TB,),
        in_specs=in_specs,
        out_specs=[walk(H)] + [full(B, H)] * 4,
        out_shape=[jax.ShapeDtypeStruct((T, B, H), dtype)]
        + [jax.ShapeDtypeStruct((B, H), dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(*args)
    return ys, hT1, cT1, hT2, cT2


def lstm2_layer_pallas(
    x, h01, c01, h02, c02,
    w_ih1, w_hh1, b_ih1, b_hh1, w_ih2, w_hh2, b_ih2, b_hh2,
    step_mask: Optional[jax.Array] = None,
    reset_mask: Optional[jax.Array] = None,
    reset_src: Optional[jax.Array] = None,
):
    """Fused 2-layer forward: (T, B, in) -> ys2 (T, B, H), (hT1, hT2),
    (cT1, cT2). One sequential grid for both layers."""
    dtype = x.dtype
    T, B, _ = x.shape
    H = w_hh1.shape[1]
    xg1 = (
        x.reshape(T * B, -1) @ w_ih1.T.astype(dtype) + b_ih1.astype(dtype)
    ).reshape(T, B, 4 * H)
    m2 = step_mask if step_mask is not None else jnp.ones((T, B))
    mask = jnp.broadcast_to(m2.astype(dtype)[:, :, None], (T, B, 8))
    b2 = (b_ih2 + b_hh2).astype(dtype).reshape(1, 4 * H)
    if reset_mask is not None:
        rst = jnp.broadcast_to(reset_mask.astype(dtype)[:, :, None], (T, B, 8))
        pmat = (reset_src[:, None] == jnp.arange(B)[None, :]).astype(dtype)
    else:
        rst = mask  # unused placeholder with matching shape/dtype
        pmat = jnp.zeros((B, B), dtype)
    ys, hT1, cT1, hT2, cT2 = _run2(
        xg1, w_hh1.T.astype(dtype), b_hh1.astype(dtype).reshape(1, 4 * H),
        w_ih2.T.astype(dtype), w_hh2.T.astype(dtype), b2, mask, rst, pmat,
        h01.astype(dtype), c01.astype(dtype), h02.astype(dtype), c02.astype(dtype),
        step_mask is not None, reset_mask is not None,
    )
    return ys, (hT1, hT2), (cT1, cT2)


def _train2_fwd_kernel(xg1_ref, dm_ref, whh1_ref, bhh1_ref, wih2_ref,
                       whh2_ref, b2_ref,
                       mask_ref, h01_ref, c01_ref, h02_ref, c02_ref,
                       ys1_ref, cs1_ref, ys2_ref, cs2_ref,
                       hT1_ref, cT1_ref, hT2_ref, cT2_ref,
                       h1_scr, c1_scr, h2_scr, c2_scr,
                       *, TB: int, U: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h1_scr[:] = h01_ref[:].astype(jnp.float32)
        c1_scr[:] = c01_ref[:].astype(jnp.float32)
        h2_scr[:] = h02_ref[:].astype(jnp.float32)
        c2_scr[:] = c02_ref[:].astype(jnp.float32)

    h1, c1, h2, c2 = h1_scr[:], c1_scr[:], h2_scr[:], c2_scr[:]
    dtype = ys2_ref.dtype
    bhh1 = bhh1_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    for u in range(U):
        keep = mask_ref[u][:, :1].astype(jnp.float32)
        h1, c1, h2, c2 = _cell2_steps(
            xg1_ref[u], h1, c1, h2, c2, keep, whh1_ref, bhh1,
            wih2_ref, whh2_ref, b2, dtype,
            dm_row=dm_ref[u].astype(jnp.float32))
        ys1_ref[u] = h1.astype(dtype)
        cs1_ref[u] = c1.astype(dtype)
        ys2_ref[u] = h2.astype(dtype)
        cs2_ref[u] = c2.astype(dtype)
    h1_scr[:], c1_scr[:], h2_scr[:], c2_scr[:] = h1, c1, h2, c2

    @pl.when(t == TB - 1)
    def _():
        hT1_ref[:] = h1.astype(dtype)
        cT1_ref[:] = c1.astype(dtype)
        hT2_ref[:] = h2.astype(dtype)
        cT2_ref[:] = c2.astype(dtype)


def _bwd_gate_grads(xg_fp32, h_prev, c_prev, keep, whh_ref, bias,
                    dh_carry, dc_carry, dy_row, dtype):
    """Shared single-step LSTM backward: recompute activations from the
    pre-step state, return (du, dh_prev_partial, dc_prev, dh_tot) where
    dh_prev_partial = du @ W_hh (caller adds (1-keep)*dh_tot)."""
    gates = (
        xg_fp32
        + jnp.dot(h_prev.astype(dtype), whh_ref[:], preferred_element_type=jnp.float32)
        + bias
    )
    H = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_cand = f * c_prev + i * g
    tc = jnp.tanh(c_cand)

    dh_tot = dh_carry + dy_row
    dc_tot = dc_carry
    dh_new = keep * dh_tot
    dc_new = keep * dc_tot

    do = dh_new * tc
    dc_cand = dc_new + dh_new * o * (1.0 - tc * tc)
    di = dc_cand * g
    df = dc_cand * c_prev
    dg = dc_cand * i
    dc_prev = dc_cand * f + (1.0 - keep) * dc_tot

    du = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1,
    )
    dh_prev = jax.lax.dot_general(
        du.astype(dtype), whh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return du, dh_prev, dc_prev, dh_tot


def _train2_bwd_kernel(xg1_ref, ys1_ref, dm_ref, h1p_ref, c1p_ref,
                       h2p_ref, c2p_ref,
                       dy1_ref, dy2_ref, mask_ref,
                       whh1_ref, bhh1_ref, wih2_ref, whh2_ref, b2_ref,
                       dhT1_ref, dcT1_ref, dhT2_ref, dcT2_ref,
                       du1_ref, du2_ref, dh01_ref, dc01_ref, dh02_ref, dc02_ref,
                       dh1_scr, dc1_scr, dh2_scr, dc2_scr,
                       *, TB: int, U: int):
    """Reverse-time fused 2-layer backward. Per step t: layer 2's backward
    first (recomputing its gates from ys1[t]*dmask[t] against the resident
    W_ih2 / W_hh2 blocks), whose du2 injects dh1 = (du2 @ W_ih2) * dmask[t]
    into layer 1's backward at the same t."""
    tr = pl.program_id(0)

    @pl.when(tr == 0)
    def _():
        dh1_scr[:] = dhT1_ref[:].astype(jnp.float32)
        dc1_scr[:] = dcT1_ref[:].astype(jnp.float32)
        dh2_scr[:] = dhT2_ref[:].astype(jnp.float32)
        dc2_scr[:] = dcT2_ref[:].astype(jnp.float32)

    dtype = du1_ref.dtype
    bhh1 = bhh1_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    dh1, dc1 = dh1_scr[:], dc1_scr[:]
    dh2, dc2 = dh2_scr[:], dc2_scr[:]
    for u in reversed(range(U)):
        keep = mask_ref[u][:, :1].astype(jnp.float32)
        dm = dm_ref[u].astype(jnp.float32)
        h1d_t = ys1_ref[u].astype(jnp.float32) * dm

        # layer 2 at step t (xg2 recomputed from dropped h1_t)
        xg2 = jnp.dot(h1d_t.astype(dtype), wih2_ref[:],
                      preferred_element_type=jnp.float32)
        du2, dh2_prev, dc2, dh2_tot = _bwd_gate_grads(
            xg2, h2p_ref[u].astype(jnp.float32), c2p_ref[u].astype(jnp.float32),
            keep, whh2_ref, b2, dh2, dc2,
            dy2_ref[u].astype(jnp.float32), dtype)
        dh2 = dh2_prev + (1.0 - keep) * dh2_tot
        du2_ref[u] = du2.astype(dtype)
        # grad into h1_t through xg2 = (h1_t * dmask_t) @ W_ih2
        dh1_inject = jax.lax.dot_general(
            du2.astype(dtype), wih2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * dm

        # layer 1 at step t
        du1, dh1_prev, dc1, dh1_tot = _bwd_gate_grads(
            xg1_ref[u].astype(jnp.float32),
            h1p_ref[u].astype(jnp.float32), c1p_ref[u].astype(jnp.float32),
            keep, whh1_ref, bhh1, dh1, dc1,
            dy1_ref[u].astype(jnp.float32) + dh1_inject, dtype)
        dh1 = dh1_prev + (1.0 - keep) * dh1_tot
        du1_ref[u] = du1.astype(dtype)
    dh1_scr[:], dc1_scr[:] = dh1, dc1
    dh2_scr[:], dc2_scr[:] = dh2, dc2

    @pl.when(tr == TB - 1)
    def _():
        dh01_ref[:] = dh1.astype(dtype)
        dc01_ref[:] = dc1.astype(dtype)
        dh02_ref[:] = dh2.astype(dtype)
        dc02_ref[:] = dc2.astype(dtype)


@jax.jit
def _train2_fwd_run(xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask,
                    h01, c01, h02, c02):
    T, B, G = xg1.shape
    H = G // 4
    dtype = xg1.dtype
    U = _unroll2(T, B, H, _ROWS2_TRAIN_FWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    walk = lambda n: pl.BlockSpec((U, B, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda t: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_train2_fwd_kernel, TB=TB, U=U),
        grid=(TB,),
        in_specs=[
            walk(G), walk(H), full(H, G), full(1, G), full(H, G), full(H, G),
            full(1, G),
            walk(8), full(B, H), full(B, H), full(B, H), full(B, H),
        ],
        out_specs=[walk(H)] * 4 + [full(B, H)] * 4,
        out_shape=[jax.ShapeDtypeStruct((T, B, H), dtype)] * 4
        + [jax.ShapeDtypeStruct((B, H), dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask, h01, c01, h02, c02)


@jax.jit
def _train2_bwd_run(xg1, ys1, dm, h1p, c1p, h2p, c2p, dy1, dy2, mask,
                    whh1_t, bhh1, wih2_t, whh2_t, b2,
                    dhT1, dcT1, dhT2, dcT2):
    T, B, G = xg1.shape
    H = G // 4
    dtype = xg1.dtype
    U = _unroll2(T, B, H, _ROWS2_TRAIN_BWD, jnp.dtype(dtype).itemsize)
    TB = T // U
    rev = lambda n: pl.BlockSpec((U, B, n), lambda t: (TB - 1 - t, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda t: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_train2_bwd_kernel, TB=TB, U=U),
        grid=(TB,),
        in_specs=[
            rev(G), rev(H), rev(H), rev(H), rev(H), rev(H), rev(H), rev(H),
            rev(H), rev(8),
            full(H, G), full(1, G), full(H, G), full(H, G), full(1, G),
            full(B, H), full(B, H), full(B, H), full(B, H),
        ],
        out_specs=[rev(G), rev(G)] + [full(B, H)] * 4,
        out_shape=[jax.ShapeDtypeStruct((T, B, G), dtype)] * 2
        + [jax.ShapeDtypeStruct((B, H), dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(xg1, ys1, dm, h1p, c1p, h2p, c2p, dy1, dy2, mask,
      whh1_t, bhh1, wih2_t, whh2_t, b2, dhT1, dcT1, dhT2, dcT2)


@jax.custom_vjp
def lstm2_scan_fused(xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask,
                     h01, c01, h02, c02):
    """Differentiable fused 2-layer LSTM recurrence. xg1 (T, B, 4H) is
    layer 1's precomputed input projection; ``dm`` (T, B, H) the inter-layer
    inverted-dropout mask (ones when not dropping); wih2_t/whh2_t (H, 4H);
    b2 = b_ih2 + b_hh2 (1, 4H). Returns (ys1, cs1, ys2, cs2, hT1, cT1, hT2,
    cT2); cs1/cs2 are backward residuals — callers must not consume them."""
    return _train2_fwd_run(xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask,
                           h01, c01, h02, c02)


def _lsf2_fwd(xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask,
              h01, c01, h02, c02):
    outs = _train2_fwd_run(xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask,
                           h01, c01, h02, c02)
    ys1, cs1, ys2, cs2, hT1, cT1, hT2, cT2 = outs
    res = (xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask, h01, c01, h02,
           c02, ys1, cs1, ys2, cs2)
    return outs, res


def _lsf2_bwd(res, grads):
    (xg1, dm, whh1_t, bhh1, wih2_t, whh2_t, b2, mask, h01, c01, h02, c02,
     ys1, cs1, ys2, cs2) = res
    dy1, _dcs1, dy2, _dcs2, dhT1, dcT1, dhT2, dcT2 = grads
    z_seq = lambda g: jnp.zeros_like(ys1) if g is None else g
    z_bh = lambda g: jnp.zeros_like(h01) if g is None else g
    dy1, dy2 = z_seq(dy1), z_seq(dy2)
    dhT1, dcT1, dhT2, dcT2 = z_bh(dhT1), z_bh(dcT1), z_bh(dhT2), z_bh(dcT2)

    h1p = jnp.concatenate([h01[None], ys1[:-1]], axis=0)
    c1p = jnp.concatenate([c01[None], cs1[:-1]], axis=0)
    h2p = jnp.concatenate([h02[None], ys2[:-1]], axis=0)
    c2p = jnp.concatenate([c02[None], cs2[:-1]], axis=0)
    du1, du2, dh01, dc01, dh02, dc02 = _train2_bwd_run(
        xg1, ys1, dm, h1p, c1p, h2p, c2p, dy1, dy2, mask,
        whh1_t, bhh1, wih2_t, whh2_t, b2, dhT1, dcT1, dhT2, dcT2)

    T, B, G = du1.shape
    du1f = du1.reshape(T * B, G).astype(jnp.float32)
    du2f = du2.reshape(T * B, G).astype(jnp.float32)
    flat = lambda a: a.reshape(T * B, -1).astype(jnp.float32)
    dwhh1 = (flat(h1p).T @ du1f).astype(whh1_t.dtype)
    dbhh1 = jnp.sum(du1f, axis=0).reshape(1, G).astype(bhh1.dtype)
    # xg2 = (ys1 * dm) @ W_ih2  =>  dW_ih2 = (ys1 * dm)^T @ du2
    dwih2 = (flat(ys1 * dm.astype(ys1.dtype)).T @ du2f).astype(wih2_t.dtype)
    dwhh2 = (flat(h2p).T @ du2f).astype(whh2_t.dtype)
    db2 = jnp.sum(du2f, axis=0).reshape(1, G).astype(b2.dtype)
    return (du1.astype(xg1.dtype), None, dwhh1, dbhh1, dwih2, dwhh2, db2,
            None,
            dh01.astype(h01.dtype), dc01.astype(c01.dtype),
            dh02.astype(h02.dtype), dc02.astype(c02.dtype))


lstm2_scan_fused.defvjp(_lsf2_fwd, _lsf2_bwd)


def lstm2_layer_pallas_train(
    x, h01, c01, h02, c02,
    w_ih1, w_hh1, b_ih1, b_hh1, w_ih2, w_hh2, b_ih2, b_hh2,
    step_mask=None, dropout_mask=None,
):
    """Differentiable fused 2-layer LSTM: (T, B, in) -> ys2 (T, B, H),
    (hT1, hT2), (cT1, cT2). Layer 1's input projection stays OUTSIDE the
    custom VJP (one big MXU matmul; its grads flow through XLA AD); layer
    2's runs inside against the resident W_ih2 block. ``dropout_mask``
    (T, B, H) is the inter-layer inverted-dropout mask (torch nn.LSTM
    drops each layer's output except the last)."""
    dtype = x.dtype
    T, B, _ = x.shape
    H = w_hh1.shape[1]
    xg1 = (
        x.reshape(T * B, -1) @ w_ih1.T.astype(dtype) + b_ih1.astype(dtype)
    ).reshape(T, B, 4 * H)
    m2 = step_mask if step_mask is not None else jnp.ones((T, B))
    mask = jnp.broadcast_to(m2.astype(dtype)[:, :, None], (T, B, 8))
    b2 = (b_ih2 + b_hh2).astype(dtype).reshape(1, 4 * H)
    dm = (jnp.ones((T, B, H), dtype) if dropout_mask is None
          else dropout_mask.astype(dtype))
    ys1, cs1, ys2, cs2, hT1, cT1, hT2, cT2 = lstm2_scan_fused(
        xg1, dm, w_hh1.T.astype(dtype), b_hh1.astype(dtype).reshape(1, 4 * H),
        w_ih2.T.astype(dtype), w_hh2.T.astype(dtype), b2, mask,
        h01.astype(dtype), c01.astype(dtype),
        h02.astype(dtype), c02.astype(dtype),
    )
    return ys2, (hT1, hT2), (cT1, cT2)


def pallas_lstm2_ok(nhid: int, dtype, batch: Optional[int] = None,
                    train: bool = False) -> bool:
    """Availability gate for the fused 2-layer kernels: TPU backend, all
    three resident weight blocks fit, and the U=1 block set fits the
    scoped-VMEM budget at the given batch."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if nhid * 4 * nhid * itemsize > 8 * 1024 * 1024:
        return False
    if batch is not None:
        rows = _ROWS2_TRAIN_BWD if train else _ROWS2_FWD
        if _est_vmem2(1, batch, nhid, rows * nhid, itemsize, reset=not train) \
                > int(0.9 * _VMEM_LIMIT):
            return False
    return True


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
        # scoring batches may route to the reset kernel (packed layouts),
        # so gate on its larger block set like pallas_lstm2_ok does
        rows = _ROWS_TRAIN_BWD if train else _ROWS_FWD
        if _est_vmem(1, batch, nhid, rows * nhid, itemsize, reset=not train) \
                > int(0.9 * _VMEM_LIMIT):
            return False
    return True
