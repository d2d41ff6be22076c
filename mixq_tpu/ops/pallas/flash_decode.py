"""Flash decode attention over a dense head-major KV cache (bf16 or int8).

The decode step is HBM-bandwidth-bound and the KV cache read dominates its
bytes at serving context lengths. Two measured failure modes motivate this
kernel (CLAUDE.md, PROFILE_r02.md):

  1. XLA lowers the T=1 attention einsums to broadcast-multiply-REDUCE on
     the VPU (no MXU dot at all — verified in the optimized HLO of the 7B
     decode step), so decode attention runs at VPU rate, ~6ms/step off the
     DMA roofline at Llama-2-7B shapes.
  2. Any int8 path that widens K/V to bf16 pays a per-element VPU convert
     over the whole cache — that IS the measured "int8 KV slower than
     bf16" overhead; it cannot be fused away, it must be designed away.

Design (v4 — each rule below is a measured lesson, B=256 S=128 7B shapes):

  - cache layout [n_kv, B, S, D]: each (head, row) owns a contiguous
    [S, D] stripe.
  - FEW BIG PROGRAMS: a paged-attention-style grid of one tiny program
    per (batch row, kv head) is overhead-bound on a dense cache (8192
    programs x 16KB DMAs measured 190ms/step). Grid is (head_blocks, B):
    each program DMAs a [h_blk, S, D] K and V block for ONE row (strided
    over heads, contiguous 64KB+ per head — dims S and D are copied
    whole, so Mosaic's 128-alignment rule for sliced dims never applies
    and any S works), double-buffered so the next program's copy overlaps
    this program's compute. DMA-only mode measures 600-800GB/s.
  - BATCHED DOTS, NO VPU GLUE: the whole compute is two dot_generals
    with the head axis as a batch dim ([h,g,D]x[h,S,D] and
    [h,g,S]x[h,S,D]). Per-head unrolled mini-dots (v2: 2.9ms/call) and
    a block-diagonal two-big-dots trick (v3: 2.9ms/call) both drowned in
    VPU work (transposes, diag extraction, masked repeats — bisection
    showed each such stage costs 0.5-1.5ms); the batched form runs at
    the DMA roofline (0.335ms = 827GB/s int8, vs XLA's 0.625ms).
  - whole-S rows in VMEM -> ONE single-pass softmax per head; no online
    merge, no m/l carry.
  - int8 cache: the MXU consumes the int8 bits DIRECTLY (int8 x int8 ->
    int32): q is absmax-quantized once per program, probs are scale-folded
    and absmax-quantized per head — tiny [h, g, *] tensors. Per-token
    cache scales multiply the [h, g, S] score tiles, never the [S, D]
    data.
  - bf16 cache: bf16 operands straight into the MXU, f32 accumulation.
  - per-row valid length and optional kv_start (left-padded prompts)
    masking; zero-length rows produce zeros.

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

_VMEM_BUDGET = 8 * 1024 * 1024      # double-buffered K+V blocks
_VMEM_BUDGET_BLK = 12 * 1024 * 1024  # budget when batch-row blocking is on:
                                     # the compiler's SCOPED vmem limit is
                                     # 16MB (measured: an 18MB K+V scratch
                                     # fails AOT with "Scoped allocation
                                     # ... exceeded scoped vmem limit"),
                                     # and q/out/scale blocks + temps need
                                     # the rest

# Write-combining window (KVCache.create(tail_r=...)): single-token
# head-major cache writes are tile-scattered (h*B 128-byte segments,
# measured ~0.39 ms/layer at 7B B=256 — PROFILE_r02.md "In-model
# integration"), so decode tokens stage in a token-major [L, R, B, h, d]
# buffer and the whole transposed window is re-written into the main
# cache each step at its R-aligned base (layers.py KVCache docstring).
# R=8 costs +R int8 KV slots/row of HBM and makes each span store
# sublane-aligned.
DEFAULT_TAIL_R = 8


def _pick_h_blk(n_kv: int, S: int, D: int, itemsize: int) -> int:
    """Largest head-block (divisor of n_kv) whose double-buffered K+V
    blocks fit the VMEM budget."""
    h = n_kv
    while h > 1 and 2 * 2 * h * S * D * itemsize > _VMEM_BUDGET:
        h //= 2
    while n_kv % h != 0:
        h -= 1
    return max(h, 1)


def _pick_b_blk(B: int, n_kv: int, h_blk: int, S: int, D: int,
                itemsize: int, groups: int, has_tail: bool) -> int:
    """Batch-row block: rows per program. At small S the v4 per-row grid is
    PROGRAM-OVERHEAD-bound, not DMA-bound (S=32 B=512 7B in-model: 0.87
    ms/layer vs a 0.17ms DMA floor — 512 programs/layer each moving only
    260KB; at S=128 the same grid hits 827GB/s because each program moves
    1MB+). Blocking b_blk rows per program cuts the program count 8-32x and
    turns the per-(head,row) 4KB DMA segments into contiguous b_blk*4KB
    spans. The batched dots take (head, row) as one fused batch dim — no
    new VPU glue on the main path (the measured v4 rule).

    Only when the full head range fits one program (h_blk == n_kv) and
    g == 1: with GQA the q block would need an in-kernel [h,g,b]->[h,b,g]
    relayout, and GQA serving shapes are S>=128 where v4 already hits the
    roofline. Multiples of 8 only (the block's sublane dim). With a tail,
    the blocked path moves the tail attend OUTSIDE the kernel (emit_ml) —
    in-kernel tail relayouts measured 0.45-0.53 ms/layer."""
    del has_tail
    if groups != 1 or h_blk != n_kv or S >= 128:
        return 1
    b = 1
    for cand in (8, 16, 32):
        if (B % cand == 0
                and 2 * 2 * h_blk * cand * S * D * itemsize
                <= _VMEM_BUDGET_BLK):
            b = cand
    return b


def _kernel(
    # scalar prefetch
    layer_ref,            # [1] i32 — layer index into the [L, ...] cache.
                          # The FULL stacked cache is passed and the layer
                          # picked inside the DMA: a custom-call operand
                          # cannot fuse with the producing slice, so passing
                          # cache.k[i] makes XLA materialize a copy of the
                          # whole layer slice per call (measured +0.4-0.7
                          # ms/layer in-model — more than the kernel itself)
    lengths_ref,          # [B] i32 — valid length in the MAIN cache
    starts_ref,           # [B] i32 (kv_start per row; zeros if unused)
    tail_lens_ref,        # [B] i32 — valid tokens in the tail buffer
    buffer_index_ref,     # [1] i32 (persists across grid steps)
    init_flag_ref,        # [1] i32
    # inputs
    q_ref,                # [h_blk*g, D] block
    k_hbm_ref,            # [L, n_kv, B, S, D] in ANY/HBM
    ks_hbm_ref,           # [L, n_kv, B, 1, Sp] f32 or None (unit sublane
                          # axis: in [.., B, Sp] the B dim sits in the tiled
                          # sublane position and a single-row DMA slice
                          # would need 8-alignment; the unit axis moves B
                          # out of the tiled dims — free reshape in HBM.
                          # Sp = S padded to %128: Mosaic requires the DMA'd
                          # last dim 128-aligned even when copied whole)
    v_hbm_ref,
    vs_hbm_ref,
    kt_ref,               # [R, n_kv, D] tail block (auto-pipelined
                          # BlockSpec with every dim taken WHOLE — Mosaic
                          # requires each of the block's last-two dims to
                          # be 8/128-divisible OR equal to the full array
                          # dim, and the tail is tiny; the kernel slices
                          # its h_blk head range when the grid splits) or
                          # None
    kts_ref,              # [R, n_kv] f32 tail scales (stored [L,B,R,h]) or
                          # None
    vt_ref,
    vts_ref,
    al_ref,               # [h_blk, g, 128] f32 ALiBi slopes (value repeated
                          # on the lane axis — Mosaic wants a 128-aligned
                          # last dim; ~KBs) or None
    # outputs: o_ref (+ ml_ref when emit_ml), then the scratch refs
    o_ref,                # [h_blk*g, D]
    *rest,                # (ml_ref,)? + (k_buf, ks_buf, v_buf, vs_buf,
                          #               k_sems, v_sems)
    batch_size: int,
    h_blk: int,
    groups: int,
    quantized: bool,
    has_tail: bool,
    mode: str = "full",
    has_alibi: bool = False,  # ALiBi additive bias slope*(pos - q_pos):
                          # the per-(row,head) constant -slope*q_pos
                          # cancels in softmax, so the kernel adds
                          # slope*abs_pos on main AND tail scores (same
                          # coordinate system)
    b_blk: int = 1,       # batch rows per program (grid dim 1 counts row
                          # BLOCKS; small-S overhead amortization —
                          # _pick_b_blk docstring). The batched dots fuse
                          # (head, row) into one batch dim; g == 1 only.
    emit_ml: bool = False,  # write UNNORMALIZED pv + per-(head,row) (m, l)
                          # softmax stats to a second output; the caller
                          # merges the token-major tail OUTSIDE the kernel
                          # (any in-kernel tail relayout measured 0.45-0.53
                          # ms/layer at S=32 B=512 — §PROFILE_r04)
    softcap: float = 0.0,  # gemma2 attn_logit_softcapping: scores ->
                          # tanh(scores/cap)*cap BEFORE masks (HF order)
    scale_mult: float = 0.0,  # override of the 1/sqrt(D) score scale
                          # (gemma2 query_pre_attn_scalar^-0.5); 0 = default
):
    # NOTE measured dead end: aliasing the cache operands through the call
    # (input_output_aliases + pass-through outputs) to spare XLA's buffer
    # copies around the cache updates cost +6.3ms PER CALL on this stack
    # (1-layer 7B probe: 8.0ms vs 1.7ms aliased/not, identical HLO op
    # inventory — a runtime penalty on aliased Mosaic outputs, likely the
    # relay's buffer handling). Do not reintroduce without re-measuring.
    ml_ref = rest[0] if emit_ml else None
    k_buf, ks_buf, v_buf, vs_buf, k_sems, v_sems = rest[-6:]
    j, b = pl.program_id(0), pl.program_id(1)
    n_j = pl.num_programs(0)
    l = layer_ref[0]

    def make_copies(j, b, slot):
        h0 = j * h_blk
        if b_blk > 1:
            # row-blocked: slice a contiguous b-range (B is a leading,
            # untiled dim of the [L, n_kv, B, S, D] cache, so any b_blk
            # slices fine; per-head DMA segments grow to b_blk*S*D bytes)
            bsel = pl.ds(b * b_blk, b_blk)
        else:
            bsel = b
        copies = [
            pltpu.make_async_copy(
                k_hbm_ref.at[l, pl.ds(h0, h_blk), bsel], k_buf.at[slot],
                k_sems.at[slot]),
            pltpu.make_async_copy(
                v_hbm_ref.at[l, pl.ds(h0, h_blk), bsel], v_buf.at[slot],
                v_sems.at[slot]),
        ]
        if quantized:
            copies.append(pltpu.make_async_copy(
                ks_hbm_ref.at[l, pl.ds(h0, h_blk), bsel], ks_buf.at[slot],
                k_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                vs_hbm_ref.at[l, pl.ds(h0, h_blk), bsel], vs_buf.at[slot],
                v_sems.at[slot]))
        return copies

    slot = buffer_index_ref[0]
    init_flag = init_flag_ref[0]
    init_flag_ref[0] = 0

    @pl.when(init_flag == 1)
    def _():                # very first program starts its own DMA
        for c in make_copies(j, b, slot):
            c.start()

    # prefetch the next program's block into the other buffer
    next_b = b + 1
    next_j = jnp.where(next_b < batch_size, j, j + 1)
    next_b = jnp.where(next_b < batch_size, next_b, 0)
    next_slot = 1 - slot

    @pl.when(next_j < n_j)
    def _():
        for c in make_copies(next_j, next_b, next_slot):
            c.start()
        buffer_index_ref[0] = next_slot

    for c in make_copies(j, b, slot):
        c.wait()

    if mode == "dma":
        # tuning diagnostic: DMA + program structure only (touch every
        # buffer so nothing is DCE'd, near-zero compute) — establishes the
        # bandwidth/overhead floor this grid can reach
        nb0 = h_blk * b_blk
        k0 = k_buf[slot].reshape(nb0, -1)[:, :1].astype(jnp.float32)
        v0 = v_buf[slot].reshape(nb0, -1)[:, :1].astype(jnp.float32)
        o = k0 + v0
        if quantized:
            o = o + ks_buf[slot].reshape(nb0, -1)[:, :1] \
                  + vs_buf[slot].reshape(nb0, -1)[:, :1]
        o_ref[...] = jnp.broadcast_to(
            o[:, :, None], (nb0, groups, q_ref.shape[-1])
        ).reshape(o_ref.shape).astype(o_ref.dtype)
        if emit_ml:
            ml_ref[...] = jnp.zeros(ml_ref.shape, ml_ref.dtype)
        return

    S = k_hbm_ref.shape[3]
    D = q_ref.shape[-1]
    scale = scale_mult if scale_mult else 1.0 / (D ** 0.5)
    pos = lax.broadcasted_iota(jnp.int32, (1, S), 1)

    if b_blk > 1:
        # per-row masks from unrolled SMEM scalar reads (b_blk tiny [1, S]
        # rows — negligible next to the [S, D] blocks)
        b0 = b * b_blk
        bias_rows, live_rows = [], []
        for i in range(b_blk):
            ln = lengths_ref[b0 + i]
            st = starts_ref[b0 + i]
            tl = tail_lens_ref[b0 + i]
            bias_rows.append(
                jnp.where((pos < ln) & (pos >= st), 0.0, MASK_VALUE))
            live_rows.append(((ln + tl) > 0).astype(jnp.float32))
        bias_b = jnp.concatenate(bias_rows, axis=0)          # [b_blk, S]
        # broadcast over heads -> the fused (head, row) batch dim order
        bias = jnp.broadcast_to(
            bias_b[None, :, None, :], (h_blk, b_blk, 1, S)
        ).reshape(h_blk * b_blk, 1, S)
        live = jnp.broadcast_to(
            jnp.concatenate([r.reshape(1, 1) for r in live_rows], 0)[None],
            (h_blk, b_blk, 1)).reshape(h_blk * b_blk, 1, 1)
    else:
        length = lengths_ref[b]
        start = starts_ref[b]
        tail_len = tail_lens_ref[b]
        mask = (pos < length) & (pos >= start)               # [1, S]
        bias = jnp.where(mask, 0.0, MASK_VALUE)[None]        # [1, 1, S]
        live = ((length + tail_len) > 0).astype(jnp.float32)

    # Batched-dot formulation: ONE dot_general per contraction with the
    # head axis as a batch dim — Mosaic schedules the per-head MXU passes
    # itself with no VPU glue. Measured (B=256 S=128 n_kv=32 D=128 int8,
    # chain-timed microbench): 0.335ms = 827GB/s — at the DMA roofline,
    # ~2x XLA's reduce lowering (0.625ms) and ~9x the earlier formulations
    # (per-head unrolled mini-dots 2.9ms; block-diagonal trick 2.9ms —
    # the diag-extract/repeat/mask VPU stages each added 0.5-1.5ms).
    # With b_blk > 1 the batch dim is the fused (head, row) axis: the
    # [h_blk, b_blk, S, D] buffer reshapes to it contiguously, so the
    # dots stay glue-free at any row block.
    nb = h_blk * b_blk               # fused batch dim of the dots
    q = q_ref[...].astype(jnp.float32).reshape(nb * groups, D)
    k3 = k_buf[slot].reshape(nb, S, D)
    v3 = v_buf[slot].reshape(nb, S, D)
    if quantized:
        q_absmax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        q_scale = jnp.maximum(q_absmax / 127.0, 1e-8)        # [nb*g, 1]
        q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
        q_all = q_i8.reshape(nb, groups, D)
        qs_all = q_scale.reshape(nb, groups, 1)
        S_pad = ks_buf.shape[-1]         # scales lane dim padded to %128
        ks = ks_buf[slot].reshape(nb, S_pad)[:, :S]
        vs = vs_buf[slot].reshape(nb, S_pad)[:, :S]
        # int8 cache bits straight into the MXU (i8 x i8 -> i32)
        qk = lax.dot_general(
            q_all, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                # [nb, g, S]
        qk = qk.astype(jnp.float32) * qs_all * ks[:, None, :] * scale
    else:
        q_all = q.astype(jnp.bfloat16).reshape(nb, groups, D)
        qk = lax.dot_general(
            q_all, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # [nb, g, S]
    if softcap:
        qk = jnp.tanh(qk / softcap) * softcap
    qk = qk + bias                     # [1,1,S] or [nb,1,S] — broadcasts

    if has_alibi:
        al2 = al_ref[...][:, :, :1]                          # [h_blk, g, 1]
        if b_blk > 1:
            alibi_sl = jnp.broadcast_to(
                al2[:, None], (h_blk, b_blk, groups, 1)
            ).reshape(nb, groups, 1)
        else:
            alibi_sl = al2
        qk = qk + alibi_sl * pos[None].astype(jnp.float32)
    else:
        alibi_sl = None

    if has_tail:
        # Tail scores: the last <=R unflushed tokens live in the
        # token-major tail. The tail is tiny, so it is widened +
        # scale-folded on the VPU (negligible vs the [S, D] cache) and
        # joined into the SAME online softmax as the main scores.
        # b_blk > 1 with a tail never reaches here: the wrapper routes it
        # through emit_ml + the XLA-side merge (in-kernel tail relayouts
        # measured 0.45-0.53 ms/layer at S=32 B=512 — ~17ms of the step).
        assert b_blk == 1, "blocked tail is handled outside the kernel"
        ktw = kt_ref[...]                                    # [R, n_kv, D]
        vtw = vt_ref[...]
        kts = kts_ref[...] if quantized else None            # [R, n_kv]
        vts = vts_ref[...] if quantized else None
        if kt_ref.shape[1] != h_blk:      # head grid split: our range
            hslice = lambda x, ax: lax.dynamic_slice_in_dim(
                x, pl.program_id(0) * h_blk, h_blk, axis=ax)
            ktw, vtw = hslice(ktw, 1), hslice(vtw, 1)
            if quantized:
                kts, vts = hslice(kts, 1), hslice(vts, 1)
        # head-major [h, R, D] for the batched dots: Mosaic's tpu.matmul
        # requires BOTH batch dims at operand position 0 ("batch dims
        # must be equal") — a [R,h,*]-batched-on-dim-1 form fails to
        # lower. The swap is a ~32KB relayout.
        ktw = jnp.swapaxes(ktw, 0, 1).astype(jnp.float32)    # [h, R, D]
        vtw = jnp.swapaxes(vtw, 0, 1).astype(jnp.float32)
        if quantized:
            ktw = ktw * jnp.swapaxes(kts, 0, 1)[..., None]   # [h, R, 1]
            vtw = vtw * jnp.swapaxes(vts, 0, 1)[..., None]
        R = ktw.shape[1]
        qk_t = lax.dot_general(                              # [h, g, R]
            q.reshape(h_blk, groups, D).astype(jnp.bfloat16),
            ktw.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if softcap:
            qk_t = jnp.tanh(qk_t / softcap) * softcap
        tpos = lax.broadcasted_iota(jnp.int32, (1, R), 1)
        qk_t = qk_t + jnp.where(tpos < tail_len, 0.0, MASK_VALUE)[None]
        if alibi_sl is not None:      # tail tokens sit at positions
            qk_t = qk_t + (alibi_sl   # length..length+tail_len-1
                           * (length + tpos)[None].astype(jnp.float32))
        m = jnp.maximum(jnp.max(qk, axis=-1, keepdims=True),
                        jnp.max(qk_t, axis=-1, keepdims=True))
        p_t = jnp.exp(qk_t - m)
        pv_t = lax.dot_general(                              # [nb, g, D]
            p_t.astype(jnp.bfloat16), vtw.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        l_t = jnp.sum(p_t, axis=-1, keepdims=True)
    else:
        m = jnp.max(qk, axis=-1, keepdims=True)
        pv_t = 0.0
        l_t = 0.0

    p = jnp.exp(qk - m)
    l = jnp.sum(p, axis=-1, keepdims=True) + l_t
    if quantized:
        p2 = p * vs[:, None, :]                              # fold v scales
        p_scale = jnp.maximum(
            jnp.max(p2, axis=-1, keepdims=True) / 127.0, 1e-20)
        p_i8 = jnp.round(p2 / p_scale).astype(jnp.int8)      # [nb, g, S]
        pv = lax.dot_general(
            p_i8, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                # [nb, g, D]
        pv = pv.astype(jnp.float32) * p_scale
    else:
        pv = lax.dot_general(
            p.astype(jnp.bfloat16), v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    if emit_ml:
        # unnormalized pv + (m, l) stats; the caller's XLA-side merge
        # joins the tail softmax and applies /l and the live mask.
        # All-masked rows emit m=MASK_VALUE with bogus l — the caller's
        # live mask zeroes them (values stay finite).
        o_ref[...] = pv.reshape(o_ref.shape).astype(o_ref.dtype)
        lanes = ml_ref.shape[-1]
        ml = jnp.concatenate(
            [m, l] + [jnp.zeros_like(m)] * (lanes - 2), axis=-1)
        ml_ref[...] = ml.reshape(ml_ref.shape).astype(ml_ref.dtype)
        return
    o = (pv + pv_t) / l
    o = o * live
    o_ref[...] = o.reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "mode", "h_blk", "b_blk", "softcap",
                     "scale"),
)
def flash_decode_attention(
    q: jax.Array,                   # [B, n_q, D]
    k: jax.Array,                   # [(L,) n_kv, B, S, D] bf16 | int8
                                    # (head-major; pass the FULL stacked
                                    # cache + `layer` — a 4D layer slice
                                    # forces XLA to materialize a copy)
    v: jax.Array,
    lengths,                        # scalar or [B] i32 valid length in the
                                    # MAIN cache (excludes tail tokens)
    k_scale: Optional[jax.Array] = None,   # [(L,) n_kv, B, S or Sp] f32
    v_scale: Optional[jax.Array] = None,
    kv_start=None,                  # scalar or [B] first valid slot
    k_tail: Optional[jax.Array] = None,    # [(L,) R, B, n_kv, D] token-major
                                    # staging buffer (KVCache tail)
    v_tail: Optional[jax.Array] = None,
    kt_scale: Optional[jax.Array] = None,  # [(L,) B, R, n_kv] f32
    vt_scale: Optional[jax.Array] = None,
    tail_lens=None,                 # scalar or [B] valid tail tokens
    interpret: bool = False,
    mode: str = "full",             # "dma": diagnostic DMA-floor variant
                                    # (same grid/copies, compute disabled)
    h_blk: Optional[int] = None,    # tuning override of the head-block size
    layer=None,                     # i32 layer index for 5D caches
    alibi_slopes: Optional[jax.Array] = None,  # [n_q] f32 per-head ALiBi
                                    # slopes (config-derived)
    b_blk: Optional[int] = None,    # tuning override of the batch-row block
    softcap: float = 0.0,           # gemma2 logit softcap (static)
    scale: Optional[float] = None,  # score-scale override (static; gemma2
                                    # query_pre_attn_scalar^-0.5)
):
    """Returns attention output [B, n_q, D] in q.dtype."""
    B, n_q, D = q.shape
    quantized = k_scale is not None
    has_tail = k_tail is not None
    if k.ndim == 4:                 # single-layer view -> unit layer axis
        k, v = k[None], v[None]
        if quantized:
            k_scale, v_scale = k_scale[None], v_scale[None]
        if has_tail:
            k_tail, v_tail = k_tail[None], v_tail[None]
            if quantized:
                kt_scale, vt_scale = kt_scale[None], vt_scale[None]
        layer = 0
    if layer is None:
        raise ValueError("5D stacked cache requires a layer index")
    _, n_kv, _, S, _ = k.shape
    g = n_q // n_kv

    if h_blk is None:
        h_blk = _pick_h_blk(n_kv, S, D, k.dtype.itemsize)
    n_j = n_kv // h_blk
    if b_blk is None:
        b_blk = _pick_b_blk(B, n_kv, h_blk, S, D, k.dtype.itemsize, g,
                            has_tail)
    assert B % b_blk == 0, (B, b_blk)
    if b_blk > 1:
        assert g == 1 and h_blk == n_kv, (g, h_blk, n_kv)
    # Row-blocked + tail: the tail attend moves OUTSIDE the kernel. Any
    # in-kernel route to the (head,row)-batched tail dots needs a VMEM
    # relayout of the token-major block, and Mosaic relayouts/unrolled
    # per-row stages measured 0.45-0.53 ms/layer at S=32 B=512 (~17ms of
    # the 49.2ms step) vs 0.186 ms/layer tail-free. The kernel emits
    # unnormalized pv + (m, l); XLA attends the tiny [R, B, h, D] tail
    # (token-major, no relayout needed for a reduce lowering) and merges.
    tail_outside = has_tail and b_blk > 1

    layer_arr = jnp.asarray(layer, jnp.int32).reshape((1,))
    lengths = jnp.broadcast_to(jnp.asarray(lengths, jnp.int32), (B,))
    if kv_start is None:
        kv_start = 0
    starts = jnp.broadcast_to(jnp.asarray(kv_start, jnp.int32), (B,))
    if tail_lens is None:
        tail_lens = 0
    tail_lens = jnp.broadcast_to(jnp.asarray(tail_lens, jnp.int32), (B,))

    if quantized:
        # Mosaic requires the LAST dim of the per-row scales DMA to be
        # 128-aligned even when copied whole ("Slice shape along dimension
        # must be aligned to tiling (128)"); the K/V data blocks are exempt
        # because their last dim is D (%128 gated). KVCache.create allocates
        # head-major scales pre-padded; pad here only for raw unpadded
        # inputs (tiny XLA pad, µs-scale).
        S_pad = -(-S // 128) * 128
        if k_scale.shape[-1] == S_pad:
            pass                    # already padded at allocation
        elif k_scale.shape[-1] == S:
            pad = ((0, 0),) * (k_scale.ndim - 1) + ((0, S_pad - S),)
            k_scale = jnp.pad(k_scale, pad)
            v_scale = jnp.pad(v_scale, pad)
        else:
            raise ValueError(
                f"k_scale last dim {k_scale.shape[-1]} is neither S={S} "
                f"nor padded S={S_pad}")
        # unit sublane axis so the per-row DMA never slices a tiled dim
        k_scale = k_scale[:, :, :, None, :]
        v_scale = v_scale[:, :, :, None, :]
    else:
        S_pad = S

    hg = h_blk * g
    # <1x128>-layout hint for thin blocks (stock paged-attention trick):
    # a unit axis stops Mosaic assuming an 8-sublane tile for small hg
    if b_blk > 1:
        # row-blocked: q/out go HEAD-major [n_kv, g, B, D] so each
        # program's block reshapes contiguously into the fused (head, row)
        # batch dim — the transpose happens OUTSIDE the kernel where it is
        # one cheap XLA relayout per step, not per-program VPU glue.
        # f32 launch dtype keeps the (b_blk, D) block on the 8x128 tile.
        q_kernel = q.reshape(B, n_kv, g, D).transpose(1, 2, 0, 3)
        q_spec = pl.BlockSpec((h_blk, g, b_blk, D),
                              lambda j, b, *_: (j, 0, b, 0))
        q_launch_dtype = jnp.float32
        out_shape = jax.ShapeDtypeStruct((n_kv, g, B, D), jnp.float32)
    elif hg % 8 != 0:
        q_kernel = q.reshape(B, n_q, 1, D)
        q_spec = pl.BlockSpec((None, hg, None, D),
                              lambda j, b, *_: (b, j, 0, 0))
        q_launch_dtype = jnp.float32
        out_shape = jax.ShapeDtypeStruct((B, n_q, 1, D), jnp.float32)
    else:
        q_kernel = q
        q_spec = pl.BlockSpec((None, hg, D), lambda j, b, *_: (b, j, 0))
        q_launch_dtype = q.dtype
        out_shape = jax.ShapeDtypeStruct((B, n_q, D), jnp.float32)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    has_alibi = alibi_slopes is not None
    if has_alibi:
        # [n_q] -> [n_kv, g, 128]: the value repeated across the lane axis
        # (Mosaic wants the block's last dim 128-aligned; a few KB)
        al3 = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(n_kv, g)[..., None],
            (n_kv, g, 128))
        al_spec = pl.BlockSpec((h_blk, g, 128), lambda j, b, *_: (j, 0, 0))
    else:
        al3 = al_spec = None
    kernel = functools.partial(
        _kernel, batch_size=B // b_blk, h_blk=h_blk, groups=g,
        quantized=quantized, has_tail=has_tail and not tail_outside,
        mode=mode, has_alibi=has_alibi, b_blk=b_blk,
        emit_ml=tail_outside, softcap=float(softcap or 0.0),
        scale_mult=float(scale) if scale is not None else 0.0)

    if has_tail and not tail_outside:
        R = k_tail.shape[1]
        # auto-pipelined blocks (not manual DMA), every dim taken WHOLE
        # (Mosaic block alignment rule — see kernel param comments);
        # values are [L, R, B, n_kv, D], scales [L, B, R, n_kv]; the
        # layer index comes from the prefetched scalar (index maps
        # receive the scalar refs after the grid ids)
        kt_spec = pl.BlockSpec(
            (None, R, None, n_kv, D),
            lambda j, b, layer, *_: (layer[0], 0, b, 0, 0))
        kts_spec = pl.BlockSpec(
            (None, None, R, n_kv),
            lambda j, b, layer, *_: (layer[0], b, 0, 0))
    else:
        kt_spec = kts_spec = None

    in_specs = [
        q_spec,
        any_spec,
        any_spec if quantized else None,
        any_spec,
        any_spec if quantized else None,
        kt_spec,
        kts_spec if quantized else None,
        kt_spec,
        kts_spec if quantized else None,
        al_spec,
    ]
    if b_blk > 1:
        kv_buf_shape = (2, h_blk, b_blk, S, D)
        sc_buf_shape = (2, h_blk, b_blk, 1, S_pad)
    else:
        kv_buf_shape = (2, h_blk, S, D)
        sc_buf_shape = (2, h_blk, 1, S_pad)
    scratch_shapes = (
        pltpu.VMEM(kv_buf_shape, k.dtype),
        pltpu.VMEM(sc_buf_shape, jnp.float32) if quantized else None,
        pltpu.VMEM(kv_buf_shape, v.dtype),
        pltpu.VMEM(sc_buf_shape, jnp.float32) if quantized else None,
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    )

    if tail_outside:
        # second output: per-(head,row) (m, l) softmax stats. Lane dim 8 =
        # full-dim block (allowed by the Mosaic last-two-dims rule), so the
        # stats cost ~0.5MB/layer of traffic instead of a 128-lane pad.
        ml_shape = jax.ShapeDtypeStruct((n_kv, g, B, 8), jnp.float32)
        ml_spec = pl.BlockSpec((h_blk, g, b_blk, 8),
                               lambda j, b, *_: (j, 0, b, 0))
        out_shape = (out_shape, ml_shape)
        out_specs = (q_spec, ml_spec)
    else:
        out_specs = q_spec

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            in_specs=in_specs,
            out_specs=out_specs,
            grid=(n_j, B // b_blk),
            scratch_shapes=scratch_shapes,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # row-blocked scratch + f32 score temps exceed the default
            # 16MB scoped-vmem limit (measured 22.85M at b_blk=16 S=32
            # int8); the kernel double-buffers its own DMAs, so raising
            # the cap is safe — v5e VMEM is 128MB
            vmem_limit_bytes=(64 * 1024 * 1024 if b_blk > 1 else None)),
        out_shape=out_shape,
        interpret=interpret,
    )(
        layer_arr,
        lengths,
        starts,
        tail_lens,
        jnp.zeros((1,), jnp.int32),   # buffer index
        jnp.ones((1,), jnp.int32),    # init flag
        q_kernel.astype(q_launch_dtype),
        k,
        k_scale,
        v,
        v_scale,
        k_tail if not tail_outside else None,
        kt_scale if quantized and not tail_outside else None,
        v_tail if not tail_outside else None,
        vt_scale if quantized and not tail_outside else None,
        al3,
    )

    if tail_outside:
        out, ml = out
        # head-major [n_kv, g, B, *] -> [B, n_q, *]
        o_un = out.transpose(2, 0, 1, 3).reshape(B, n_q, D)
        m_k = ml[..., 0].transpose(2, 0, 1).reshape(B, n_q)
        l_k = ml[..., 1].transpose(2, 0, 1).reshape(B, n_q)
        R = k_tail.shape[1]
        ktf = k_tail[layer].astype(jnp.float32)        # [R, B, n_kv, D]
        vtf = v_tail[layer].astype(jnp.float32)
        if quantized:
            # tail scales stored [L, B, R, n_kv]
            ktf = ktf * jnp.transpose(
                kt_scale[layer], (1, 0, 2))[..., None]
            vtf = vtf * jnp.transpose(
                vt_scale[layer], (1, 0, 2))[..., None]
        sc = scale if scale is not None else 1.0 / (D ** 0.5)
        scores_t = jnp.einsum(
            "bhd,rbhd->bhr", q.astype(jnp.float32), ktf,
            preferred_element_type=jnp.float32) * sc
        if softcap:
            scores_t = jnp.tanh(scores_t / softcap) * softcap
        tpos = jnp.arange(R, dtype=jnp.int32)
        scores_t = scores_t + jnp.where(
            tpos[None, None, :] < tail_lens[:, None, None],
            0.0, MASK_VALUE)
        if has_alibi:   # tail tokens at absolute positions length + tpos
            scores_t = scores_t + (
                jnp.asarray(alibi_slopes, jnp.float32)[None, :, None]
                * (lengths[:, None, None] + tpos[None, None, :]
                   ).astype(jnp.float32))
        m_j = jnp.maximum(m_k, jnp.max(scores_t, axis=-1))   # [B, n_q]
        a_k = jnp.exp(m_k - m_j)
        p_t = jnp.exp(scores_t - m_j[..., None])
        pv_t = jnp.einsum("bhr,rbhd->bhd", p_t, vtf,
                          preferred_element_type=jnp.float32)
        l_j = jnp.maximum(l_k * a_k + jnp.sum(p_t, axis=-1), 1e-20)
        live = ((lengths + tail_lens) > 0).astype(jnp.float32)
        o = (o_un * a_k[..., None] + pv_t) / l_j[..., None] \
            * live[:, None, None]
        return o.astype(q.dtype)

    if b_blk > 1:                    # head-major out -> [B, n_q, D]
        out = out.transpose(2, 0, 1, 3)
    return out.reshape(B, n_q, D).astype(q.dtype)


def flash_decode_sharded(
    q, k, v, lengths,
    k_scale=None, v_scale=None, kv_start=None,
    k_tail=None, v_tail=None, kt_scale=None, vt_scale=None,
    tail_lens=None, interpret: bool = False, layer=None,
    alibi_slopes=None,
    mesh=None, batch_axis: str = "data", head_axis: str = "model",
    softcap: float = 0.0, scale=None,
):
    """flash_decode_attention under GSPMD meshes: a pallas call is OPAQUE
    to the SPMD partitioner (it would all-gather/replicate the multi-GB
    cache operands), so meshed callers run the kernel inside
    jax.shard_map — each shard attends its own (batch rows x kv heads)
    block; there is no cross-shard math because softmax is per
    (row, head). Falls back to the plain call when no mesh is given or
    the shapes don't divide the mesh (replicated: correct but slow)."""
    plain = functools.partial(
        flash_decode_attention, q, k, v, lengths, k_scale, v_scale,
        kv_start=kv_start, k_tail=k_tail, v_tail=v_tail,
        kt_scale=kt_scale, vt_scale=vt_scale, tail_lens=tail_lens,
        interpret=interpret, layer=layer, alibi_slopes=alibi_slopes,
        softcap=softcap, scale=scale)
    if mesh is None:
        return plain()
    from jax.sharding import PartitionSpec as P

    B, n_q, _ = q.shape
    n_kv = k.shape[1 if k.ndim == 5 else 0]
    dp = mesh.shape.get(batch_axis, 1)
    tp = mesh.shape.get(head_axis, 1)
    if (B % dp or n_q % tp or n_kv % tp
            or (k.ndim == 4 and k_tail is not None)):
        return plain()

    # scalars/Nones -> [B] arrays so they shard on the batch axis
    lengths = jnp.broadcast_to(jnp.asarray(lengths, jnp.int32), (B,))
    kv_start = (jnp.zeros((B,), jnp.int32) if kv_start is None else
                jnp.broadcast_to(jnp.asarray(kv_start, jnp.int32), (B,)))
    quantized = k_scale is not None
    has_tail = k_tail is not None
    if has_tail:
        tail_lens = jnp.broadcast_to(
            jnp.asarray(0 if tail_lens is None else tail_lens, jnp.int32),
            (B,))
    layer_arr = jnp.asarray(0 if layer is None else layer, jnp.int32)

    stacked = k.ndim == 5
    kv_spec = (P(None, head_axis, batch_axis, None, None) if stacked
               else P(head_axis, batch_axis, None, None))
    sc_spec = (P(None, head_axis, batch_axis, None) if stacked
               else P(head_axis, batch_axis, None))
    args = [q, k, v, lengths, kv_start, layer_arr]
    specs = [P(batch_axis, head_axis, None), kv_spec, kv_spec,
             P(batch_axis), P(batch_axis), P()]
    if quantized:
        args += [k_scale, v_scale]
        specs += [sc_spec, sc_spec]
    if has_tail:
        args += [k_tail, v_tail, tail_lens]
        specs += [P(None, None, batch_axis, head_axis, None)] * 2 \
            + [P(batch_axis)]
        if quantized:
            args += [kt_scale, vt_scale]
            specs += [P(None, batch_axis, None, head_axis)] * 2
    if alibi_slopes is not None:
        args.append(jnp.asarray(alibi_slopes, jnp.float32))
        specs.append(P(head_axis))

    def inner(*ts):
        it = iter(ts)
        q_, k_, v_, len_, st_, li_ = [next(it) for _ in range(6)]
        ks_ = vs_ = kt_ = vt_ = kts_ = vts_ = tl_ = al_ = None
        if quantized:
            ks_, vs_ = next(it), next(it)
        if has_tail:
            kt_, vt_, tl_ = next(it), next(it), next(it)
            if quantized:
                kts_, vts_ = next(it), next(it)
        if alibi_slopes is not None:
            al_ = next(it)
        return flash_decode_attention(
            q_, k_, v_, len_, ks_, vs_, kv_start=st_,
            k_tail=kt_, v_tail=vt_, kt_scale=kts_, vt_scale=vts_,
            tail_lens=tl_, interpret=interpret, layer=li_,
            alibi_slopes=al_, softcap=softcap, scale=scale)

    return jax.shard_map(
        inner, mesh=mesh, in_specs=tuple(specs),
        out_specs=P(batch_axis, head_axis, None), check_vma=False,
    )(*args)


def use_head_major_cache(attn_impl: str, model_cfg, max_seq: int,
                         kv_itemsize: int) -> bool:
    """Single policy point for 'should serving use the head-major flash
    cache?' — used by the engine and the continuous-batching pool.

      "flash"  explicit opt-in: head-major whenever the compiled kernel
               supports the shapes (always on non-TPU backends, where the
               kernel runs in interpret mode);
      "auto"   (the default) flash on TPU for INT8 KV at max_seq >= 128 —
               measured faster than every XLA lowering there, in the FULL
               32-layer model (BENCH_MATRIX r3: B=128 S=128 flash 6,549.7
               vs xla 1,668.7 tok/s; B=64 S=256 3,639.7 vs 838.7 — the
               int8-KV XLA attend also collapses past ~10.5GB working
               sets, which flash sidesteps; PROFILE_r03.md §2). At S=32
               XLA's reduce lowering still wins (0.944 vs 1.604 ms/layer:
               kernel fixed overhead + sub-lane S padding don't pay off
               when per-step KV traffic is tiny). bf16 KV stays on XLA:
               in-model flash loses 9% at B=128 S=128 (5,404 vs 5,918
               tok/s) even though the isolated kernel wins — XLA fuses
               the bf16 attend with its neighbors and keeps the cheap
               batch-major T=1 cache write. int8 KV is the serving
               default (PPL delta +0.03-0.19%, PPL_GATE_r03*.json);
      anything else: batch-major cache.

    Sliding-window and ALiBi models resolve to False under "auto" (the
    ring cache bounds window-model KV memory to the window; flash must
    hold max_seq) but honor the explicit "flash" opt-in: the kernel
    windows via its per-row start offset (memory-for-speed trade,
    measured +9%: 0.428 vs 0.471 ms at B=256 S=128 int8,
    MICROBENCH_WIN_ALIBI.jsonl) and adds the ALiBi bias from
    config-derived constants (measured at XLA parity, 0.367 vs 0.369).
    """
    if attn_impl not in ("flash", "auto"):
        return False
    if ((model_cfg.sliding_window is not None or model_cfg.alibi)
            and attn_impl != "flash"):
        return False
    if (model_cfg.attn_logit_softcap is not None
            or model_cfg.query_pre_attn_scalar is not None
            or model_cfg.sliding_window_pattern != 1):
        # gemma2-style attention: the kernel handles softcap and the
        # custom score scale (static params, r5); alternating windows
        # are a no-op while max_seq <= sliding_window (serving contexts
        # vs gemma2's 4096 window). Explicit "flash" opt-in only —
        # "auto" keeps gemma2 on XLA until measured on hardware.
        if attn_impl != "flash":
            return False
        if (model_cfg.sliding_window_pattern != 1
                and model_cfg.sliding_window is not None
                and max_seq > model_cfg.sliding_window):
            return False  # a binding alternating window needs per-layer
                          # start offsets the kernel doesn't take yet
    import jax as _jax

    on_tpu = _jax.default_backend() == "tpu"
    if attn_impl == "auto" and (not on_tpu or kv_itemsize != 1
                                or max_seq < 128):
        return False      # interpret-mode kernels are test-only; bf16 KV
                          # and short contexts measured faster on XLA
    if not on_tpu:
        return True
    return flash_decode_supported(
        model_cfg.num_key_value_heads, max_seq, model_cfg.head_dim_,
        kv_itemsize)


def flash_decode_supported(n_kv: int, S: int, D: int,
                           dtype_itemsize: int) -> bool:
    """Gate for the compiled kernel: Mosaic requires SLICED DMA dims
    128-aligned — only the head dim is ever sliced (S and D are copied
    whole), so head_dim-64 models ("Slice shape along dimension 3 must be
    aligned to tiling (128)") stay on the XLA path while any S works.
    Plus a VMEM budget for the double-buffered [h_blk, S, D] K+V blocks."""
    if D % 128 != 0:
        return False
    return 2 * 2 * S * D * dtype_itemsize <= _VMEM_BUDGET   # h_blk=1 floor
