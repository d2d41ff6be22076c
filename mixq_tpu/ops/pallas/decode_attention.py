"""SUPERSEDED — tests-only reference implementation.

Measured VPU-bound on hardware (31.8 ms at 7B B=512 vs 26.5 ms xla_int8,
PROFILE_r02.md) and replaced by the MXU flash-decode kernel
(ops/pallas/flash_decode.py, attn_impl="flash"). No model path dispatches
here anymore (attn_impl="pallas" now raises); the kernel is kept because
its differential tests document the VPU broadcast-multiply-reduce
formulation that the profile work measured against.

Original design notes:

Fused decode attention over the (optionally int8) KV cache.

The decode step is HBM-bandwidth-bound and the KV cache is a large share of
the bytes. The XLA path reads int8 KV through an int8->bf16 convert that
partially materializes (measured ~6.5ms/step overhead at Llama-2-7B B=256);
this kernel streams each batch row's KV slice through VMEM once — int8 bits
straight off HBM, per-(token,head) scales applied to the small score/prob
tiles in registers — so the only HBM traffic is the cache itself.

Replaces flash_attn_func for the T=1 decode case (reference fused/attn.py:256
uses flash attention even at decode). Layout matches the cache: the [S,
n_kv*D] slice per row is contiguous in HBM, so each grid program is one big
linear DMA.

Supports MHA and GQA (groups = n_q // n_kv), uniform or per-row valid
lengths. Single-pass softmax per head (S fits VMEM for S <= ~1024; the
chunked online-softmax variant is the follow-up for long context).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(len_ref, start_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
            out_ref, *, n_kv: int, groups: int, D: int, S: int,
            quantized: bool, bm: int):
    """Decode attention as broadcast-multiply-reduce on the VPU, `bm` batch
    rows per grid program.

    A per-head MXU formulation degenerates into n_kv tiny [g,D]x[D,S] dots
    per program (instruction-overhead-bound, measured 3x slower than XLA),
    and one-row programs leave the grid overhead dominant; the blocked VPU
    form — elementwise products over the streamed KV block with segment
    reductions — keeps the op at the DMA rate.
    """
    scale = 1.0 / (D ** 0.5)
    for r in range(bm):
        kv_len = len_ref[pl.program_id(0) * bm + r]
        kv_start = start_ref[pl.program_id(0) * bm + r]
        # [S*n_kv, D] -> [S, n_kv, D]: splits the sublane (major) dim — a
        # free relayout (n_kv is sublane-aligned), unlike lane splits
        k = k_ref[r].reshape(S, n_kv, D)
        v = v_ref[r].reshape(S, n_kv, D)
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        valid = (pos < kv_len) & (pos >= kv_start)
        ks = ks_ref[r] if quantized else None                # [S, n_kv]
        vs = vs_ref[r] if quantized else None

        # q/out are laid out [n_kv, groups*D]: lane-sliced per query group
        # so every tile is 2D with a 128-lane minor dim
        for g in range(groups):
            q_g = q_ref[r, :, g * D:(g + 1) * D].astype(jnp.float32)
            scores = jnp.sum(
                k.astype(jnp.float32) * q_g[None], axis=-1) * scale  # [S,h]
            if quantized:
                scores = scores * ks
            scores = jnp.where(valid, scores, -1e30)
            m = jnp.max(scores, axis=0, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)            # [S, n_kv]
            if quantized:
                p = p * vs
            out = jnp.sum(p[:, :, None] * v.astype(jnp.float32), axis=0)
            out_ref[r, :, g * D:(g + 1) * D] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jax.Array,                   # [B, n_q, D] (T=1 squeezed)
    k: jax.Array,                   # [B, S, n_kv, D] int8 | bf16
    v: jax.Array,
    kv_len,                         # scalar or [B] int32 valid length
    k_scale: Optional[jax.Array] = None,   # [B, S, n_kv] f32
    v_scale: Optional[jax.Array] = None,
    kv_start=None,                  # scalar or [B] first valid slot
    interpret: bool = False,
) -> jax.Array:
    B, n_q, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    groups = n_q // n_kv
    quantized = k_scale is not None

    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
    if kv_start is None:
        kv_start = 0
    kv_start = jnp.broadcast_to(jnp.asarray(kv_start, jnp.int32), (B,))
    # q: [B, n_q, D] -> [B, n_kv, groups*D] (head h*groups+g at lanes g*D+d)
    q = q.reshape(B, n_kv, groups * D)
    k2 = k.reshape(B, S * n_kv, D)
    v2 = v.reshape(B, S * n_kv, D)
    if not quantized:
        # dummy 1-lane scale refs keep one kernel signature
        k_scale = jnp.ones((B, S, 1), jnp.float32)
        v_scale = k_scale
    n_sc = k_scale.shape[2]

    # rows per program: amortize grid overhead, bounded by VMEM
    # (2 x bm x S x n_kv x D input bytes + f32 row temporaries)
    bm = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and 2 * cand * S * n_kv * D * k.dtype.itemsize \
                <= 4 * 1024 * 1024:
            bm = cand
            break

    kernel = functools.partial(
        _kernel, n_kv=n_kv, groups=groups, D=D, S=S, quantized=quantized,
        bm=bm)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // bm,),
        in_specs=[
            pl.BlockSpec((bm, n_kv, groups * D), lambda b, len_ref, start_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, S * n_kv, D), lambda b, len_ref, start_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, S * n_kv, D), lambda b, len_ref, start_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, S, n_sc), lambda b, len_ref, start_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, S, n_sc), lambda b, len_ref, start_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n_kv, groups * D),
                               lambda b, len_ref, start_ref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, groups * D), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_q * D * S,
            bytes_accessed=2 * B * S * n_kv * D * k.dtype.itemsize
            + B * n_q * D * 4,
            transcendentals=B * n_q * S,
        ),
        interpret=interpret,
    )(kv_len, kv_start, q, k2, v2, k_scale, v_scale)
    return out.reshape(B, n_q, D)


def decode_attention_supported(k: jax.Array, vmem_budget: int = 4 * 2 ** 20
                               ) -> bool:
    """Whether the per-program KV block fits the kernel's VMEM budget at
    bm=1 (the gate callers use before selecting the fused path)."""
    _, S, n_kv, D = k.shape
    return 2 * S * n_kv * D * k.dtype.itemsize <= vmem_budget
