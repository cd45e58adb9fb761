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


def _kernel(xg_ref, whh_ref, bhh_ref, mask_ref, h0_ref, c0_ref,
            ys_ref, hT_ref, cT_ref, h_scr, c_scr, *, T: int, masked: bool):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    # Gates and nonlinearities run in fp32 (Mosaic's transcendentals want a
    # uniform element type; fp32 also keeps the carried cell state accurate),
    # while the MXU matmul consumes the bf16 weight block directly.
    h = h_scr[:]
    c = c_scr[:]
    dtype = ys_ref.dtype
    gates = (
        xg_ref[0].astype(jnp.float32)
        + jnp.dot(h.astype(dtype), whh_ref[:], preferred_element_type=jnp.float32)
        + bhh_ref[0].astype(jnp.float32)
    )
    H = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    if masked:
        keep = mask_ref[0][:, :1].astype(jnp.float32)  # (B, 1)
        h_new = keep * h_new + (1.0 - keep) * h
        c_new = keep * c_new + (1.0 - keep) * c
    h_scr[:] = h_new
    c_scr[:] = c_new
    ys_ref[0] = h_new.astype(dtype)

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_new.astype(dtype)
        cT_ref[:] = c_new.astype(dtype)


@functools.partial(jax.jit, static_argnames=("masked",))
def _run(xg, w_hh_t, b_hh, mask, h0, c0, masked: bool):
    T, B, G = xg.shape
    H = G // 4
    dtype = xg.dtype
    kernel = functools.partial(_kernel, T=T, masked=masked)
    grid = (T,)
    ys, hT, cT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
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
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(T, B, in) -> (T, B, H), hT, cT. Forward-only fused recurrence."""
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
    return _run(
        xg,
        w_hh.T.astype(dtype),
        b_hh.astype(dtype).reshape(1, 4 * H),
        mask,
        h0.astype(dtype),
        c0.astype(dtype),
        step_mask is not None,
    )


def pallas_lstm_ok(nhid: int, dtype) -> bool:
    """Conservative availability gate: TPU backend + W_hh fits VMEM."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    whh_bytes = nhid * 4 * nhid * jnp.dtype(dtype).itemsize
    return whh_bytes <= 8 * 1024 * 1024
