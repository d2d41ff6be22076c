"""Unified mixed-precision GEMM + epilogue kernel (decode-shape tuned).

The one-kernel form of the reference's fused linears —
`mixlib.int8FusedDequantize[Silu]` (linear.py:251,283), the int4 variant
(`mixlib.int4FusedDequantize`, linear.py:259, incl. its 2-nibbles/byte
packing, linear.py:14-23) and `EETQ.w8_a16_gemm` (linear.py:178-184) —
re-attempted with the flash-decode v4 lessons (PROFILE_r02.md):

  * ALL compute is one MXU dot per block (+ one small outlier dot); the
    only VPU work is the dequant scale multiply on the [bm, bn] output
    tile and, for W4, the nibble unpack of the weight block.
  * The grid streams the WEIGHT once (the big operand at decode shapes:
    M <= 256, K x N >= 16M) — DMA-roofline target is K*N*w_bytes/BW.
  * W4 weights arrive PACKED (uint8, 2 values/byte, halves layout:
    ops/quant.py pack_int4) and are unpacked in the prologue after the
    VMEM load — the HBM read is half of W8's, which XLA cannot do on
    this stack (the relay cannot transfer jnp.int4 buffers; a widened
    int8 store forfeits the whole point of int4).

Modes (static, from dtypes):
  q_x int8  + w int8          -> W8A8  int8 dot, scales epilogue
  q_x int8  + w uint8(packed) -> W4A8/W4A4 unpack prologue, int8 dot
  x   bf16  + w int8          -> W8A16 weight-dequant prologue, bf16 dot
  x   bf16  + w uint8(packed) -> W4A16 unpack+dequant prologue, bf16 dot
plus optional fp outlier GEMM term and silu/gelu fusion — the full
epilogue of the reference's `forward_without_precondition[FusedSilu]`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _unpack_w4(p: jax.Array) -> jax.Array:
    """[K/2, bn] uint8 (halves layout) -> [K, bn] int8 in [-8, 7].

    Formulated as i32 widen + shift-left/arithmetic-shift-right sign
    extension: Mosaic cannot legalize `arith.shrui` (and i8 shifts at
    all) on the real TPU backend — logical ops on the u8 bits fail with
    "failed to legalize operation 'arith.shrui'", while i32 shl/shrsi
    lower fine (probed on-chip, r3). The widen is a VPU convert on the
    streamed weight block only."""
    b = p.astype(jnp.int32)
    lo = (b << 28) >> 28            # sign-extended low nibble
    hi = (b << 24) >> 28            # sign-extended high nibble
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _expand_group_scale(ws: jax.Array, K: int) -> jax.Array:
    """[G, bn] per-group scales -> [K, bn]: broadcast each group's row over
    its group_size K-rows. Lane dim (bn) is untouched; the expansion is a
    sublane broadcast+collapse, which Mosaic legalizes (probed on-chip)."""
    G, bn = ws.shape
    gs = K // G
    return jnp.broadcast_to(ws[:, None, :], (G, gs, bn)).reshape(K, bn)


def _grouped_int8_dot(xg: jax.Array, w: jax.Array, ws: jax.Array,
                      xs: jax.Array) -> jax.Array:
    """Group-quantized int8 GEMM as ONE G-batched MXU dot.

    xg: [G, bm, gs] int8 (the wrapper pre-shapes the activation — cheap:
    the activation is tiny next to the streamed weight), w: [K, bn] int8,
    ws: [G, bn] f32, xs: [bm, 1] f32. Per-group scales cannot factor out
    of a single K-contraction; batching the contraction per group keeps
    the int8 MXU path (a bf16 weight-dequant prologue was measured 27%
    slower in-model at B=32 — the 2-pass VPU rewrite of the whole weight
    block dominates the bandwidth-bound step)."""
    G, bm, gs = xg.shape
    wg = w.reshape(G, gs, w.shape[1])
    acc = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)            # [G, bm, bn]
    y = jnp.sum(acc.astype(jnp.float32) * ws[:, None, :], axis=0)
    return y * xs


def _kernel(x_ref, w_ref, xs_ref, ws_ref, out_ref, *, fuse: str,
            w4: bool, a16: bool):
    w = _unpack_w4(w_ref[:]) if w4 else w_ref[:]
    grouped = ws_ref.shape[0] > 1
    if grouped and not a16:
        y = _grouped_int8_dot(x_ref[:], w, ws_ref[:], xs_ref[:])
    elif a16:
        # weight-only: dequant into the operand, bf16 MXU dot. Grouped
        # scales fold into the weight block (int values <= 127 are exact
        # in bf16; the scale multiply is the only rounding).
        ws = ws_ref[:]
        if grouped:
            ws = _expand_group_scale(ws, w.shape[0])
        wd = w.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16)
        y = jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)
    else:
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
    if fuse == "silu":
        y = y * jax.nn.sigmoid(y)
    elif fuse in ("gelu", "gelu_new"):
        y = jax.nn.gelu(y, approximate=fuse == "gelu_new")
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_outlier(x_ref, w_ref, xs_ref, ws_ref, xo_ref, wo_ref, out_ref,
                    *, fuse: str, w4: bool, a16: bool):
    w = _unpack_w4(w_ref[:]) if w4 else w_ref[:]
    grouped = ws_ref.shape[0] > 1
    if grouped and not a16:
        y = _grouped_int8_dot(x_ref[:], w, ws_ref[:], xs_ref[:])
    elif a16:
        ws = ws_ref[:]
        if grouped:
            ws = _expand_group_scale(ws, w.shape[0])
        wd = w.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16)
        y = jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)
    else:
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
    y = y + jnp.dot(xo_ref[:].astype(jnp.float32),
                    wo_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    if fuse == "silu":
        y = y * jax.nn.sigmoid(y)
    elif fuse in ("gelu", "gelu_new"):
        y = jax.nn.gelu(y, approximate=fuse == "gelu_new")
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fuse", "out_dtype", "block_m", "block_n", "interpret"))
def mix_gemm(
    x: jax.Array,                   # int8 [M, K] (quantized act) | bf16 [M, K]
    w: jax.Array,                   # int8 [K, N] | uint8 [K/2, N] (W4 packed)
    x_scale: Optional[jax.Array] = None,   # f32 [M, 1] (int8 x only)
    w_scale: Optional[jax.Array] = None,   # f32 [N] | f32 [G, N] (grouped)
    x_outlier: Optional[jax.Array] = None,  # bf16 [M, B]
    w_outlier: Optional[jax.Array] = None,  # bf16 [B, N]
    fuse: str = "none",
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    w4 = w.dtype == jnp.uint8
    a16 = x.dtype != jnp.int8
    if w4:
        K = w.shape[0] * 2
        assert x.shape[1] == K, "packed W4 weight must be [K/2, N]"
    N = w.shape[1]
    has_outlier = x_outlier is not None and w_outlier is not None
    if a16:
        # unused operand (pallas needs a concrete input); 1-lane dummy
        x_scale = jnp.ones((M, 1), jnp.float32)
    w_scale = jnp.asarray(w_scale, jnp.float32)
    if w_scale.ndim == 1:
        w_scale = w_scale[None, :]
    G = w_scale.shape[0]            # 1 = per-channel, >1 = per-group scales
    assert K % G == 0, f"K={K} not divisible by scale groups G={G}"

    bm = min(block_m, _round_up(M, 32))
    bn = min(block_n, _round_up(N, 128))
    # VMEM-budget block chooser: Mosaic double-buffers the streamed blocks
    # (grid dims are parallel), so the K=11008 down-proj at bn=1024 wants
    # 2x11.3MB of weight block alone — over the 16MB scoped limit
    # ("Scoped allocation with size 22.50M ... exceeded", measured r3).
    # Shrink bn (then bm) until 2x(x + w) blocks + output-tile temps fit.
    x_item = 2 if a16 else 1
    Kw_est = K // 2 if w4 else K

    grouped_a8 = G > 1 and not a16

    def _vmem(bm_, bn_):
        blocks = 2 * (bm_ * K * x_item + Kw_est * bn_) + 2 * G * bn_ * 4
        temps = bm_ * bn_ * 10          # i32 acc + f32 dequant + out tile
        if grouped_a8:
            temps += G * bm_ * bn_ * 4          # [G, bm, bn] i32 batched acc
            if w4:
                temps += K * bn_                # unpacked int8 weight block
        elif a16 or G > 1:
            temps += Kw_est * bn_ * 2 * (2 if w4 else 1)   # bf16 wd block
        if has_outlier:
            Bo_ = x_outlier.shape[1]
            blocks += 2 * (bm_ * Bo_ + Bo_ * bn_) * 2
            temps += bm_ * bn_ * 4
        return blocks + temps

    _BUDGET = 13 * 1024 * 1024
    while bn > 128 and _vmem(bm, bn) > _BUDGET:
        bn //= 2
    while bm > 32 and _vmem(bm, bn) > _BUDGET:
        bm //= 2
    bn = max(bn, 128)
    bm = max(bm, 32)
    Mp, Np = _round_up(M, bm), _round_up(N, bn)

    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, Mp - M), (0, 0)))
        if has_outlier:
            x_outlier = jnp.pad(x_outlier, ((0, Mp - M), (0, 0)))
    if Np != N:
        w = jnp.pad(w, ((0, 0), (0, Np - N)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, Np - N)))
        if has_outlier:
            w_outlier = jnp.pad(w_outlier, ((0, 0), (0, Np - N)))

    Kw = w.shape[0]          # K or K/2 (packed)
    grid = (Mp // bm, Np // bn)
    if grouped_a8:
        # pre-shape the activation to [G, M, gs] so the kernel's grouped
        # contraction is ONE G-batched MXU dot (batch dims at operand
        # position 0, per the Mosaic batched-dot rule) — the reshape +
        # transpose is an XLA pass over the SMALL operand only
        gs = K // G
        x = x.reshape(Mp, G, gs).transpose(1, 0, 2)
        x_spec = pl.BlockSpec((G, bm, gs), lambda i, j: (0, i, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((Kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, w, x_scale, w_scale]
    if has_outlier:
        Bo = x_outlier.shape[1]
        in_specs += [
            pl.BlockSpec((bm, Bo), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bo, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        args += [x_outlier, w_outlier]
        kernel = functools.partial(_kernel_outlier, fuse=fuse, w4=w4, a16=a16)
    else:
        kernel = functools.partial(_kernel, fuse=fuse, w4=w4, a16=a16)

    flops = 2 * Mp * Np * K + (2 * Mp * Np * x_outlier.shape[1]
                               if has_outlier else 0)
    x_bytes = Mp * K * (2 if a16 else 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_bytes + Kw * Np + 2 * Mp * Np,
            transcendentals=Mp * Np if fuse != "none" else 0,
        ),
        interpret=interpret,
    )(*args)
    return out[:M, :N]
