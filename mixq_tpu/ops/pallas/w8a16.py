"""Weight-only W8A16 matmul: int8 weights dequantized in-kernel.

Pallas equivalent of EETQ.w8_a16_gemm (reference linear.py:178-184). The
weights stream through VMEM as int8 (half the HBM bytes of bf16 — this path
is weight-bandwidth-bound at decode) and are scaled to bf16 in registers
right before the MXU.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, qw_ref, ws_ref, out_ref):
    w = qw_ref[:].astype(jnp.bfloat16) * ws_ref[:].astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "interpret"))
def w8a16_matmul(
    x: jax.Array,                  # bf16 [M, K]
    q_w: jax.Array,                # int8 [K, N]
    w_scale: jax.Array,            # f32 [N]
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    _, N = q_w.shape
    bm = min(block_m, _round_up(M, 16))
    bn = min(block_n, _round_up(N, 128))
    Mp, Np = _round_up(M, bm), _round_up(N, bn)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N:
        q_w = jnp.pad(q_w, ((0, 0), (0, Np - N)))
        w_scale = jnp.pad(w_scale, (0, Np - N))

    out = pl.pallas_call(
        _kernel,
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=2 * Mp * K + K * Np + 2 * Mp * Np,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q_w, w_scale[None, :].astype(jnp.float32))
    return out[:M, :N]
