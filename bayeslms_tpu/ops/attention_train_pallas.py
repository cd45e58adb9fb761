"""Pallas TPU kernels: differentiable causal flash attention with in-kernel
attention-prob dropout (training path).

The XLA training path materializes the (B*h, T, T) score/prob matrices in
HBM three-plus times (forward scores + probs residual + backward dprobs) and
generates the (B*h, T, T) dropout mask with jax.random. Here:

  forward : one kernel per (batch*head, q-block) computes the causal softmax
            row-block online and applies dropout to the probabilities with
            the ON-CORE PRNG — the (T, T) matrices and the mask never exist
            in HBM. Emits per-token (rowmax m, rowsum l) stats.
  backward: flash-attention-2 style — two kernels RECOMPUTE probability
            tiles from (q, k, m, l) and regenerate bit-identical dropout
            tiles from (seed, batchhead, q-block, k-block):
              dq[i] = (P_i ∘ (Z∘(dO_i V^T) - delta_i)) K * scale
              dv[j] = sum_i (Z∘P)_ij^T dO_i
              dk[j] = sum_i dS_ij^T q_i * scale
            with delta = rowsum(dO ∘ O) (equals rowsum(P~ ∘ dP) even under
            dropout, since P~ = Z∘P is what produced O).

Dropout semantics match the reference (model.py:905-907: dropout applied to
the normalized attention probabilities): probs -> Z∘probs with
Z ∈ {0, 1/keep}. The PRNG stream is pltpu's (same distribution as
jax.random, different bits), so masked-value tests compare statistics and
gradient checks use finite differences against the kernel itself.

Reference: the self-built MultiheadAttention hot path model.py:884-917.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False

_NEG = -1e30


def _drop_tile(shape, keep: float):
    """{0, 1/keep} dropout tile from 24-bit uniforms (logical shift clears
    the sign bit; Mosaic has no uint32->f32 cast)."""
    bits = jax.lax.shift_right_logical(pltpu.prng_random_bits(shape), 8)
    thresh = int(keep * (1 << 24))
    return jnp.where(bits < thresh, 1.0 / keep, 0.0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                *, scale: float, bq: int, bk: int, rate: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dtype = q_ref.dtype
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (S, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, S)
    rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols <= rows, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)

    if rate > 0.0:
        keep = 1.0 - rate
        S = s.shape[1]
        acc = jnp.zeros((p.shape[0], v_ref.shape[2]), jnp.float32)
        nj = S // bk
        ni = pl.num_programs(1)
        for j in range(nj):
            # Mosaic caps prng_seed at 2 values: fold (b, i, j) into one
            # collision-free index (shared formula across all three kernels)
            pltpu.prng_seed(seed_ref[0], (b * ni + i) * nj + j)
            z = _drop_tile((p.shape[0], bk), keep)
            pz = p[:, j * bk:(j + 1) * bk] * z
            acc = acc + jax.lax.dot_general(
                pz.astype(dtype), v_ref[0, j * bk:(j + 1) * bk],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
    else:
        acc = jax.lax.dot_general(
            p.astype(dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    m_ref[0] = jnp.broadcast_to(m, m_ref.shape[1:])
    l_ref[0] = jnp.broadcast_to(l, l_ref.shape[1:])


def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, m_ref, l_ref,
                   dl_ref, dq_ref, *, scale: float, bq: int, bk: int,
                   rate: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dtype = q_ref.dtype
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols <= rows, s, _NEG)
    m = m_ref[0][:, :1]
    l = l_ref[0][:, :1]
    p = jnp.exp(s - m) / l  # (bq, S) normalized probs

    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, S)
    if rate > 0.0:
        keep = 1.0 - rate
        S = s.shape[1]
        zs = []
        nj = S // bk
        ni = pl.num_programs(1)
        for j in range(nj):
            pltpu.prng_seed(seed_ref[0], (b * ni + i) * nj + j)
            zs.append(_drop_tile((p.shape[0], bk), keep))
        dp = dp * jnp.concatenate(zs, axis=1)
    ds = p * (dp - dl_ref[0][:, :1])  # (bq, S)
    dq_ref[0] = (
        jax.lax.dot_general(
            ds.astype(dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, m_ref, l_ref,
                    dl_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, bq: int, bk: int, rate: float):
    b = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)  # q-blocks INNER so dk/dv accumulate in VMEM
    ni = pl.num_programs(2)
    dtype = q_ref.dtype

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols <= rows, s, _NEG)
    m = m_ref[0][:, :1]
    l = l_ref[0][:, :1]
    p = jnp.exp(s - m) / l  # (bq, bk)

    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    if rate > 0.0:
        ni = pl.num_programs(2)
        nj = pl.num_programs(1)
        pltpu.prng_seed(seed_ref[0], (b * ni + i) * nj + j)
        z = _drop_tile(p.shape, 1.0 - rate)
        pz = p * z
        dp = dp * z
    else:
        pz = p
    ds = p * (dp - dl_ref[0][:, :1])  # (bq, bk)

    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        pz.astype(dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == ni - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk", "rate"))
def _run_fwd(q, k, v, seed, scale: float, bq: int, bk: int, rate: float):
    BH, T, d = q.shape
    grid = (BH, T // bq)
    kern = functools.partial(_fwd_kernel, scale=scale, bq=bq, bk=bk, rate=rate)
    stat = jax.ShapeDtypeStruct((BH, T, 8), jnp.float32)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, d), lambda b, i, s: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, d), lambda b, i, s: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype), stat, stat],
        interpret=_INTERPRET,
    )(seed, q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk", "rate"))
def _run_bwd(q, k, v, do, m, l, delta, seed, scale: float, bq: int, bk: int,
             rate: float):
    BH, T, d = q.shape
    kq = functools.partial(_bwd_dq_kernel, scale=scale, bq=bq, bk=bk, rate=rate)
    dq = pl.pallas_call(
        kq,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, T // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, d), lambda b, i, s: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, d), lambda b, i, s: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
    )(seed, q, k, v, do, m, l, delta)

    kkv = functools.partial(_bwd_dkv_kernel, scale=scale, bq=bq, bk=bk, rate=rate)
    dk, dv = pl.pallas_call(
        kkv,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, T // bk, T // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, j, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda b, j, i, s: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda b, j, i, s: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, d), lambda b, j, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, j, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, j, i, s: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 8), lambda b, j, i, s: (b, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bk, d), lambda b, j, i, s: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda b, j, i, s: (b, j, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 2,
        interpret=_INTERPRET,
    )(seed, q, k, v, do, m, l, delta)
    return dq, dk, dv


def _heads(x, nhead):
    T, B, E = x.shape
    d = E // nhead
    return x.reshape(T, B, nhead, d).transpose(1, 2, 0, 3).reshape(B * nhead, T, d)


def _unheads(x, T, B, nhead):
    BH, T_pad, d = x.shape
    return (
        x[:, :T].reshape(B, nhead, T, d).transpose(2, 0, 1, 3).reshape(T, B, nhead * d)
    )


def _pad_t(x, bq):
    BH, T, d = x.shape
    T_pad = _round_up(T, bq)
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    return x


def _block(T: int) -> int:
    return min(128, _round_up(T, 8))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_train(q, k, v, nhead: int, rate: float, seed):
    """Differentiable fused causal MHA with attention-prob dropout.

    q, k, v: (T, B, E) projected (unscaled); seed: (1,) int32 driving the
    on-core dropout PRNG (ignored when rate == 0). Returns (T, B, E).
    """
    out, _ = _fat_fwd(q, k, v, nhead, rate, seed)
    return out


def _fat_fwd(q, k, v, nhead, rate, seed):
    T, B, E = q.shape
    d = E // nhead
    scale = float(d) ** -0.5
    bq = _block(T)
    qh = _pad_t(_heads(q, nhead), bq)
    kh = _pad_t(_heads(k, nhead), bq)
    vh = _pad_t(_heads(v, nhead), bq)
    o, m, l = _run_fwd(qh, kh, vh, seed, scale, bq, bq, rate)
    return _unheads(o, T, B, nhead), (qh, kh, vh, o, m, l, seed, T, B)


def _fat_bwd(nhead, rate, res, g):
    qh, kh, vh, o, m, l, seed, T, B = res
    d = qh.shape[-1]
    scale = float(d) ** -0.5
    bq = _block(T)
    go = _pad_t(_heads(g, nhead), bq).astype(qh.dtype)
    delta = jnp.sum(go.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))
    dq, dk, dv = _run_bwd(qh, kh, vh, go, m, l, delta, seed, scale, bq, bq, rate)
    un = lambda x: _unheads(x, T, B, nhead)
    return un(dq), un(dk), un(dv), None


flash_attention_train.defvjp(_fat_fwd, _fat_bwd)


def flash_attn_train_ok(T: int, E: int, nhead: int) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    d = E // nhead
    return d % 8 == 0 and E % nhead == 0 and T <= 8192


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
