"""Fused RMSNorm + per-token activation quantization kernel.

Pallas equivalent of mixlib.layernorm_forward_cuda_extract_outliers
(reference modules/fused/norm.py:25-33) — the key fusion of the decode path:
one HBM read of x produces BOTH the normed bf16 output and the int8
activation (+ scale) for the following linear, with outlier channels zeroed
via the dense inlier mask. The fp outlier slice is a tiny gather the caller
does with XLA (gathers along the lane dim are not a good fit for the VPU).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, kmask_ref, y_ref, qx_ref, xs_ref, *, eps, a_qmax):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)

    y_in = y * kmask_ref[:]
    absmax = jnp.max(jnp.abs(y_in), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / a_qmax, 1e-8)
    qx_ref[:] = jnp.clip(
        jnp.round(y_in / scale), -a_qmax, a_qmax).astype(jnp.int8)
    xs_ref[:] = scale


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("eps", "a_bits", "block_m", "interpret"))
def fused_rmsnorm_quant(
    x: jax.Array,                  # [M, H] bf16
    gamma: jax.Array,              # [H]
    k_mask: Optional[jax.Array] = None,   # [H] f32 inlier mask (1 = inlier)
    eps: float = 1e-5,
    a_bits: int = 8,
    block_m: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (y bf16 [M, H], q_x int8 [M, H], x_scale f32 [M, 1])."""
    M, H = x.shape
    if k_mask is None:
        k_mask = jnp.ones((H,), jnp.float32)
    bm = min(block_m, _round_up(M, 16))
    Mp = _round_up(M, bm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    a_qmax = float(2 ** (a_bits - 1) - 1)
    y, qx, xs = pl.pallas_call(
        functools.partial(_kernel, eps=eps, a_qmax=a_qmax),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, H), x.dtype),
            jax.ShapeDtypeStruct((Mp, H), jnp.int8),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x, gamma[None, :], k_mask[None, :].astype(jnp.float32))
    return y[:M], qx[:M], xs[:M]
