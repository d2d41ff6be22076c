"""Fused W8A8(O16) matmul kernel: int8 GEMM + dequant epilogue + fp16
outlier GEMM + optional SiLU, in one VMEM-resident pass.

This is the core kernel of the rebuild — the Pallas equivalent of
mixlib.int8FusedDequantize / int8FusedDequantizeSilu (reference call sites
mixquant/modules/linear.py:244-283) including the outlier partial product
the reference computes as a separate torch.mm (linear.py:237,248). Both
contractions ride the MXU; the dequant scales and activation fusion happen
in registers before the single bf16 store to HBM.

Layout notes (pallas_guide.md): int8 tiles want (32, 128) minimum; we use
(128, 128)-multiples. K is kept whole per tile — for Llama-scale K (<=11008)
an int8 [K, bn] weight tile is <=2.8MB, well inside VMEM.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qx_ref, qw_ref, xs_ref, ws_ref, out_ref, *, fuse: str):
    acc = jnp.dot(qx_ref[:], qw_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
    if fuse == "silu":
        y = y * jax.nn.sigmoid(y)
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_outlier(qx_ref, qw_ref, xs_ref, ws_ref, xo_ref, wo_ref, out_ref,
                    *, fuse: str):
    acc = jnp.dot(qx_ref[:], qw_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
    y = y + jnp.dot(xo_ref[:].astype(jnp.float32),
                    wo_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    if fuse == "silu":
        y = y * jax.nn.sigmoid(y)
    out_ref[:] = y.astype(out_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("fuse", "out_dtype", "block_m", "block_n", "interpret"))
def int8_matmul_dequant(
    q_x: jax.Array,                 # int8 [M, K]
    q_w: jax.Array,                 # int8 [K, N]
    x_scale: jax.Array,             # f32 [M, 1]
    w_scale: jax.Array,             # f32 [N]
    x_outlier: Optional[jax.Array] = None,   # bf16 [M, B]
    w_outlier: Optional[jax.Array] = None,   # bf16 [B, N]
    fuse: str = "none",
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    M, K = q_x.shape
    _, N = q_w.shape
    has_outlier = x_outlier is not None and w_outlier is not None

    bm = min(block_m, _round_up(M, 32))
    bn = min(block_n, _round_up(N, 128))
    Mp, Np = _round_up(M, bm), _round_up(N, bn)

    if Mp != M:
        q_x = jnp.pad(q_x, ((0, Mp - M), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, Mp - M), (0, 0)))
        if has_outlier:
            x_outlier = jnp.pad(x_outlier, ((0, Mp - M), (0, 0)))
    if Np != N:
        q_w = jnp.pad(q_w, ((0, 0), (0, Np - N)))
        w_scale = jnp.pad(w_scale, (0, Np - N))
        if has_outlier:
            w_outlier = jnp.pad(w_outlier, ((0, 0), (0, Np - N)))

    w_scale2d = w_scale[None, :]
    grid = (Mp // bm, Np // bn)

    in_specs = [
        pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [q_x, q_w, x_scale, w_scale2d]
    if has_outlier:
        Bo = x_outlier.shape[1]
        in_specs += [
            pl.BlockSpec((bm, Bo), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bo, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        args += [x_outlier, w_outlier]
        kernel = functools.partial(_kernel_outlier, fuse=fuse)
    else:
        kernel = functools.partial(_kernel, fuse=fuse)

    flops = 2 * Mp * Np * K + (2 * Mp * Np * x_outlier.shape[1]
                               if has_outlier else 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=Mp * K + K * Np + 2 * Mp * Np,
            transcendentals=Mp * Np if fuse == "silu" else 0,
        ),
        interpret=interpret,
    )(*args)
    return out[:M, :N]
