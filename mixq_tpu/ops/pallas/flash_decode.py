"""Flash decode attention over a dense head-major KV cache (bf16 or int8).

The decode step is HBM-bandwidth-bound and the KV cache read dominates its
bytes at serving context lengths. Two measured failure modes motivate this
kernel (CLAUDE.md, VERDICT r1):

  1. XLA lowers the T=1 attention einsums to broadcast-multiply-REDUCE on
     the VPU (no MXU dot at all — verified in the optimized HLO of the 7B
     decode step), so decode attention runs at VPU rate, ~6ms/step off the
     DMA roofline at Llama-2-7B shapes.
  2. Any int8 path that widens K/V to bf16 pays a per-element VPU convert
     over the whole cache (~8.6G elements/step at B=256 S=128) — that IS
     the measured "int8 KV slower than bf16" overhead; it cannot be fused
     away, it must be designed away.

Design (modeled on the production paged-attention structure in
jax.experimental.pallas.ops.tpu.paged_attention, simplified for a dense
per-row cache — no page tables):

  - cache layout [n_kv, B, S, D]: each (head, row) owns a contiguous [S, D]
    stripe, so a KV block is one linear DMA.
  - grid (B, n_kv), sequential; per program an inner loop streams S-blocks
    through a double-buffered VMEM scratch, with the next block's DMA
    (including the first block of the next (b, h) program, skipping
    zero-length rows) issued before computing the current one.
  - int8 cache: the MXU consumes the int8 bits DIRECTLY (int8 x int8 ->
    int32): q is absmax-quantized once per program, probs are scale-folded
    and absmax-quantized per block — both tiny [g, *] tensors. Per-token
    cache scales multiply the small score tiles, never the [S, D] data.
    The only cache-sized compute is the MXU contraction itself.
  - bf16 cache: bf16 operands straight into the MXU, f32 accumulation.
  - online softmax (flash) over blocks; per-row valid length and optional
    kv_start (left-padded prompts) masking; blocks wholly outside
    [kv_start, length) are skipped, so work scales with real context.

Replaces flash_attn_func for decode (reference fused/attn.py:256) and the
earlier VPU kernel in decode_attention.py (measured VPU-bound).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    # scalar prefetch
    lengths_ref,          # [B] i32
    starts_ref,           # [B] i32 (kv_start per row; zeros if unused)
    buffer_index_ref,     # [1] i32 (persists across grid steps)
    init_flag_ref,        # [1] i32
    # inputs
    q_ref,                # [g, D] (block of [B, n_q(, 1), D])
    k_hbm_ref,            # [n_kv, B, S, D] in ANY/HBM
    ks_hbm_ref,           # [n_kv, B, S] f32 or None
    v_hbm_ref,
    vs_hbm_ref,
    # outputs
    o_ref,                # [g, D] f32
    m_ref,                # [g, 1] f32
    l_ref,                # [g, 1] f32
    # scratch
    k_buf, ks_buf, v_buf, vs_buf, k_sems, v_sems,
    *,
    batch_size: int,
    n_kv: int,
    block_s: int,
    quantized: bool,
):
    b, h = pl.program_id(0), pl.program_id(1)
    length = lengths_ref[b]

    def first_block(bb):
        return starts_ref[bb] // block_s

    def row_blocks(bb):
        return lax.div(lengths_ref[bb] + block_s - 1, block_s)

    def compute_block_indices(b, h, i):
        """Next (b, h, i) with work, scanning forward (stock-kernel logic
        adapted to dense rows + kv_start block skipping)."""

        def advance_b():
            next_b = b + 1

            def advance_to_next_live_row():
                next_next_b = next_b + 1
                return lax.fori_loop(
                    next_next_b, batch_size,
                    lambda _, bb: jnp.where(lengths_ref[bb] == 0, bb + 1, bb),
                    next_next_b)

            nb = lax.cond(
                jnp.logical_and(
                    next_b < batch_size,
                    lengths_ref[lax.clamp(0, next_b, batch_size - 1)] == 0),
                advance_to_next_live_row,
                lambda: next_b)
            return (nb, 0,
                    first_block(lax.clamp(0, nb, batch_size - 1)))

        def advance_h():
            next_h = h + 1
            return lax.cond(next_h < n_kv,
                            lambda: (b, next_h, first_block(b)), advance_b)

        return lax.cond(i < row_blocks(b), lambda: (b, h, i), advance_h)

    single_block = block_s == k_hbm_ref.shape[2]

    def make_copies(b, h, i, slot):
        # Mosaic DMA tiling requires SLICED dims 128-aligned; a whole-dim
        # copy is exempt — so when one block covers the row, index (h, b)
        # only and any S works (S=32/48/64 caches, the B=512 point).
        if single_block:
            def src(ref):
                return ref.at[h, b]
        else:
            s0 = i * block_s

            def src(ref):
                return ref.at[h, b, pl.ds(s0, block_s)]

        copies = [
            pltpu.make_async_copy(src(k_hbm_ref), k_buf.at[slot],
                                  k_sems.at[slot]),
            pltpu.make_async_copy(src(v_hbm_ref), v_buf.at[slot],
                                  v_sems.at[slot]),
        ]
        if quantized:
            copies.append(pltpu.make_async_copy(
                src(ks_hbm_ref), ks_buf.at[slot, 0], k_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                src(vs_hbm_ref), vs_buf.at[slot, 0], v_sems.at[slot]))
        return copies

    # m/l live in lane-padded [g, D] tiles (values replicated across lanes —
    # native tile shape, the stock kernel's trick); keepdims [g, 1] partials
    # broadcast against them.
    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[...] = jnp.zeros_like(l_ref)
    o_ref[...] = jnp.zeros_like(o_ref)

    q = q_ref[...].astype(jnp.float32)                       # [g, D]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if quantized:
        # absmax int8 q once per program: both MXU operands are int8
        q_absmax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        q_scale = jnp.maximum(q_absmax / 127.0, 1e-8)        # [g, 1]
        q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    else:
        q_bf = q.astype(jnp.bfloat16)

    start = starts_ref[b]
    i_lo = start // block_s

    def body(i, _):
        slot = buffer_index_ref[0]
        init_flag = init_flag_ref[0]
        init_flag_ref[0] = 0

        @pl.when(init_flag == 1)
        def _():            # very first program: its own first DMA
            for c in make_copies(b, h, i, slot):
                c.start()

        next_b, next_h, next_i = compute_block_indices(b, h, i + 1)
        next_slot = 1 - slot

        @pl.when(next_b < batch_size)
        def _():            # prefetch next block (possibly next program's)
            for c in make_copies(next_b, next_h, next_i, next_slot):
                c.start()
            buffer_index_ref[0] = next_slot

        # wait for this block (k copies + scales share k_sems; same for v)
        for c in make_copies(b, h, i, slot):
            c.wait()

        s0 = i * block_s
        pos = s0 + lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
        mask = (pos < length) & (pos >= start)               # [1, bk]

        if quantized:
            qk_i32 = jax.lax.dot_general(
                q_i8, k_buf[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)            # [g, bk]
            qk = (qk_i32.astype(jnp.float32) * q_scale
                  * ks_buf[slot] * scale)
        else:
            qk = jax.lax.dot_general(
                q_bf, k_buf[slot],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        qk = qk + jnp.where(mask, 0.0, MASK_VALUE)

        m_curr = jnp.max(qk, axis=-1, keepdims=True)         # [g, 1]
        s_curr = jnp.exp(qk - m_curr)                        # [g, bk]
        m_prev, l_prev = m_ref[...], l_ref[...]                # [g, D]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        beta = jnp.exp(m_curr - m_next)

        if quantized:
            # fold per-token v scales into probs, absmax-int8, int8 MXU
            p = s_curr * vs_buf[slot]                        # [g, bk]
            p_scale = jnp.maximum(
                jnp.max(p, axis=-1, keepdims=True) / 127.0, 1e-20)
            p_i8 = jnp.round(p / p_scale).astype(jnp.int8)   # 0..127
            pv_i32 = jax.lax.dot_general(
                p_i8, v_buf[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)            # [g, D]
            o_curr = pv_i32.astype(jnp.float32) * p_scale
        else:
            o_curr = jax.lax.dot_general(
                s_curr.astype(jnp.bfloat16), v_buf[slot],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        l_curr = jnp.sum(s_curr, axis=-1, keepdims=True)
        l_next = alpha * l_prev + beta * l_curr
        # normalized-accumulator update (stock kernel form); l_next > 0
        # whenever this body runs (at least one unmasked... masked-only
        # blocks keep l tiny but finite via exp(MASK - m))
        o_ref[...] = ((l_prev * alpha * o_ref[...] + beta * o_curr)
                      / jnp.maximum(l_next, 1e-30)).astype(o_ref.dtype)
        m_ref[...] = m_next
        l_ref[...] = l_next
        return ()

    n_my_blocks = lax.div(length + block_s - 1, block_s)
    lax.fori_loop(i_lo, n_my_blocks, body, ())


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "interpret"),
)
def flash_decode_attention(
    q: jax.Array,                   # [B, n_q, D]
    k: jax.Array,                   # [n_kv, B, S, D] bf16 | int8 (head-major)
    v: jax.Array,
    lengths,                        # scalar or [B] i32 valid length
    k_scale: Optional[jax.Array] = None,   # [n_kv, B, S] f32
    v_scale: Optional[jax.Array] = None,
    kv_start=None,                  # scalar or [B] first valid slot
    block_s: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns attention output [B, n_q, D] in q.dtype."""
    B, n_q, D = q.shape
    n_kv, _, S, _ = k.shape
    g = n_q // n_kv
    quantized = k_scale is not None

    if S <= block_s:
        block_s = S          # single-block mode: whole-row DMA, any S
    else:
        while S % block_s != 0:
            block_s //= 2
    if not interpret and (D % 128 != 0
                          or (block_s % 128 != 0 and block_s != S)):
        raise ValueError(
            f"flash_decode_attention needs 128-aligned head_dim and S-block "
            f"(got D={D}, block_s={block_s}, S={S}) — Mosaic DMA tiling; "
            f"gate callers with flash_decode_supported()")

    lengths = jnp.broadcast_to(jnp.asarray(lengths, jnp.int32), (B,))
    if kv_start is None:
        kv_start = 0
    starts = jnp.broadcast_to(jnp.asarray(kv_start, jnp.int32), (B,))

    # <1x128>-layout hint for small g (stock-kernel trick): give q a unit
    # axis so Mosaic doesn't assume an 8-sublane tile for a g-row block
    if g % 8 != 0:
        q_kernel = q.reshape(B, n_q, 1, D)
        q_spec = pl.BlockSpec((None, g, None, D),
                              lambda b, h, *_: (b, h, 0, 0))
        q_launch_dtype = jnp.float32
    else:
        q_kernel = q
        q_spec = pl.BlockSpec((None, g, D), lambda b, h, *_: (b, h, 0))
        q_launch_dtype = q.dtype

    kernel = functools.partial(
        _kernel, batch_size=B, n_kv=n_kv, block_s=block_s,
        quantized=quantized)

    in_specs = [
        q_spec,
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY) if quantized else None,
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY) if quantized else None,
    ]
    scratch_shapes = (
        pltpu.VMEM((2, block_s, D), k.dtype),
        pltpu.VMEM((2, 1, block_s), jnp.float32) if quantized else None,
        pltpu.VMEM((2, block_s, D), v.dtype),
        pltpu.VMEM((2, 1, block_s), jnp.float32) if quantized else None,
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    )

    # m/l outputs reuse the q block spec with a full D-wide last dim (values
    # replicated across lanes — the native tile shape; a 1-wide dim only
    # lowers when D is 128-aligned, which head_dim 64 models break).
    out, _, _ = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            in_specs=in_specs,
            out_specs=[q_spec, q_spec, q_spec],
            grid=(B, n_kv),
            scratch_shapes=scratch_shapes,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        out_shape=[
            jax.ShapeDtypeStruct(q_kernel.shape, jnp.float32),
            jax.ShapeDtypeStruct((*q_kernel.shape[:-1], D), jnp.float32),
            jax.ShapeDtypeStruct((*q_kernel.shape[:-1], D), jnp.float32),
        ],
        interpret=interpret,
    )(
        lengths,
        starts,
        jnp.zeros((1,), jnp.int32),   # buffer index
        jnp.ones((1,), jnp.int32),    # init flag
        q_kernel.astype(q_launch_dtype),
        k,
        k_scale,
        v,
        v_scale,
    )
    return out.reshape(B, n_q, D).astype(q.dtype)


def flash_decode_supported(n_kv: int, S: int, D: int,
                           dtype_itemsize: int) -> bool:
    """Gate for the compiled kernel: Mosaic requires SLICED dims of a DMA
    copy 128-aligned — head_dim-64 models ("Slice shape along dimension 3
    must be aligned to tiling (128)") must stay on the XLA path. The S dim
    is only sliced in multi-block mode, so any S works when a single block
    covers the row (whole-dim copies are exempt); larger caches need
    S % 128 == 0. Plus a VMEM budget for the double-buffered K+V blocks."""
    if D % 128 != 0:
        return False
    block = min(S, 512)
    if S > block and S % 128 != 0:
        return False
    return 2 * 2 * block * D * dtype_itemsize <= 2 * 1024 * 1024
