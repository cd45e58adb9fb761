"""Pallas TPU kernel: fused Gaussian-sample-and-matmul.

Computes y = x @ (mean + exp(lgstd) * eps)^T with eps ~ N(0,1) generated
INSIDE the kernel from the on-core PRNG — the perturbed weight tensor is
never materialized in HBM. The XLA lowering of the reference semantics
(model.py:1083-1107: sample eps, scale, add, then matmul) writes and re-reads
the full perturbed weight per step; here sampling fuses into the weight-tile
load of the matmul.

Determinism: eps depends only on (seed, weight-tile index), so the backward
pass regenerates bit-identical noise — enabling a custom VJP with
  dx     = g @ W_eff            (W_eff regenerated, never stored)
  dmean  = g^T @ x
  dlgstd = (g^T @ x) * (W_eff - mean)        [= dW * eps * exp(lgstd)]

Normal variates via Box-Muller over pltpu.prng_random_bits. This PRNG stream
is distinct from jax.random — same distribution, different bits — so tests
compare moments, not values (tests/test_bayes_matmul.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False

_BN = 128  # weight-tile rows (out dim); fixed so fwd/bwd sampling agrees

_TWO_PI = 6.283185307179586


def _normal_bits(shape):
    """Box-Muller N(0,1) from two 24-bit uniform draws.

    prng_random_bits yields signed int32 on TPU; a LOGICAL right shift by 8
    clears the sign bit without the uint32->f32 cast Mosaic lacks.
    """
    b1 = jax.lax.shift_right_logical(pltpu.prng_random_bits(shape), 8)
    b2 = jax.lax.shift_right_logical(pltpu.prng_random_bits(shape), 8)
    # 24-bit mantissa uniforms in (0, 1]
    u1 = b1.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    u2 = b2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _sample_tile(mean_tile, lgstd_tile, seed, tile_idx):
    pltpu.prng_seed(seed + tile_idx)
    eps = _normal_bits(mean_tile.shape)
    return mean_tile.astype(jnp.float32) + jnp.exp(
        lgstd_tile.astype(jnp.float32)
    ) * eps


def _matmul_kernel(seed_ref, x_ref, mean_ref, lgstd_ref, y_ref):
    j = pl.program_id(1)
    w = _sample_tile(mean_ref[:], lgstd_ref[:], seed_ref[0], j)  # (BN, K) f32
    x = x_ref[:].astype(jnp.float32)  # (bm, K)
    y_ref[:] = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(y_ref.dtype)


def _sample_kernel(seed_ref, mean_ref, lgstd_ref, w_ref):
    j = pl.program_id(0)
    w_ref[:] = _sample_tile(mean_ref[:], lgstd_ref[:], seed_ref[0], j).astype(
        w_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("bm",))
def _fwd_run(x, mean, lgstd, seed, bm: int):
    M, K = x.shape
    N = mean.shape[0]
    grid = (M // bm, N // _BN)
    return pl.pallas_call(
        _matmul_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, K), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BN, K), lambda i, j, s: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BN, K), lambda i, j, s: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, _BN), lambda i, j, s: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        # f32 mean/lgstd tiles at large K double-buffer past the default
        # 16 MB scoped-vmem cap (measured 22.1 MB at K=4096, bm=128)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, x, mean, lgstd)


@jax.jit
def sample_weights(mean, lgstd, seed):
    """Materialize W_eff = mean + exp(lgstd)*eps with the SAME per-tile noise
    the fused matmul uses (backward pass / gate-slice sampling)."""
    N, K = mean.shape
    return pl.pallas_call(
        _sample_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // _BN,),
            in_specs=[
                pl.BlockSpec((_BN, K), lambda j, s: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BN, K), lambda j, s: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BN, K), lambda j, s: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, K), mean.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, mean, lgstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bayes_matmul(x, mean, lgstd, seed):
    """y = x @ (mean + exp(lgstd)*eps(seed))^T, (M,K)x(N,K) -> (M,N)."""
    return _bayes_matmul_fwd(x, mean, lgstd, seed)[0]


def _bayes_matmul_fwd(x, mean, lgstd, seed):
    M = x.shape[0]
    bm = _pick_bm(M)
    y = _fwd_run(x, mean, lgstd, seed, bm)
    return y, (x, mean, lgstd, seed)


def _bayes_matmul_bwd(res, g):
    x, mean, lgstd, seed = res
    w_eff = sample_weights(mean, lgstd, seed).astype(jnp.float32)
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dx = (gf @ w_eff).astype(x.dtype)
    dW = gf.T @ xf  # (N, K)
    dmean = dW.astype(mean.dtype)
    dlgstd = (dW * (w_eff - mean.astype(jnp.float32))).astype(lgstd.dtype)
    return dx, dmean, dlgstd, None


bayes_matmul.defvjp(_bayes_matmul_fwd, _bayes_matmul_bwd)


@jax.custom_vjp
def sample_noise(lgstd, seed):
    """exp(lgstd) * eps with on-core PRNG noise (same per-tile stream as the
    fused matmul). Differentiable: d/dlgstd = the noise itself. Used by the
    Bayes-LSTM gate-slice sampling so the perturbation is generated on-chip
    instead of via a jax.random normal + scale in HBM."""
    return sample_weights(jnp.zeros_like(lgstd), lgstd, seed)


def _sample_noise_fwd(lgstd, seed):
    noise = sample_weights(jnp.zeros_like(lgstd), lgstd, seed)
    return noise, noise


def _sample_noise_bwd(noise, g):
    return (g * noise, None)


sample_noise.defvjp(_sample_noise_fwd, _sample_noise_bwd)


def sample_noise_ok(shape) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return (
        platform in ("tpu", "axon")
        and len(shape) == 2
        and shape[0] % _BN == 0
        and shape[1] % 128 == 0
    )


def _pick_bm(M: int) -> int:
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if M % bm == 0:
            return bm
    return M


def bayes_matmul_ok(M: int, N: int, K: int) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    return N % _BN == 0 and K % 128 == 0 and M % 8 == 0
