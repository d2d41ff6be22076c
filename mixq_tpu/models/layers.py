"""Transformer building blocks as pure functions (norms, RoPE, attention).

TPU-native replacements for the reference's fused modules:
  - FasterTransformerRMSNorm (modules/fused/norm.py:6-39) -> rmsnorm /
    rmsnorm_quant (norm + outlier-extract + per-token quant in one pass; the
    Pallas-fused version lives in mixq_tpu/ops/pallas/rmsnorm_quant.py)
  - RotaryEmbedding + apply_rotary_pos_emb (modules/fused/attn.py:18-61,
    gptj_attn.py rotate-every-two) -> rope_cos_sin / apply_rope
  - flash_attn_func + WindowedCache (attn.py:116-204, fused/cache.py:3-38) ->
    attend() over a static-shape KV cache with masking; GQA via einsum
    grouping instead of repeat_kv materialization (mistral_attn.py:76-86)
"""
from __future__ import annotations

import dataclasses as _dc
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import LinearSpec, MixLinearParams, QuantizedAct


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def rmsnorm(x: jax.Array, scale: jax.Array, eps: float = 1e-5) -> jax.Array:
    import os as _os

    if _os.environ.get("MIXQ_ABLATE_NORM", "0") == "1":
        # DIAGNOSTIC ONLY (per-op accounting, PROFILE_r04 §3.2): skip the
        # variance reduce — prices the norm passes in a full-model A/B.
        return x * scale.astype(x.dtype)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return y.astype(x.dtype)


def layernorm(
    x: jax.Array, scale: jax.Array, bias: Optional[jax.Array], eps: float = 1e-5
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm_quant(
    x: jax.Array,
    scale: jax.Array,
    next_params: MixLinearParams,
    next_spec: LinearSpec,
    eps: float = 1e-5,
) -> Tuple[jax.Array, QuantizedAct]:
    """RMSNorm fused with the next linear's activation preparation — the key
    fusion of the reference (mixlib.layernorm_forward_cuda_extract_outliers,
    norm.py:25-33): one HBM pass produces the normed fp output AND the
    quantized int8 activation + fp outlier slice for the following linear.

    Returns (normed_x, QuantizedAct). XLA fuses this chain well already; the
    Pallas kernel version keeps everything VMEM-resident for the decode path.
    """
    y = rmsnorm(x, scale, eps)
    from mixq_tpu.ops.mixed_linear import prepare_act

    return y, prepare_act(y, next_params, next_spec)


# ---------------------------------------------------------------------------
# Rotary position embeddings
# ---------------------------------------------------------------------------

def rope_cos_sin(
    positions: jax.Array,       # [...] int32
    dim: int,
    theta: float = 10000.0,
    scaling: Optional[tuple] = None,  # None | ("linear", factor) |
                                # ("llama3", factor, low_f, high_f, orig_ctx)
) -> Tuple[jax.Array, jax.Array]:
    """Compute fp32 cos/sin tables for given positions (reference computes
    fp32 tables too, attn.py:30-44). Returns ([..., dim/2] cos, sin).

    `scaling` implements HF rope_scaling: "linear" divides every frequency
    by `factor`; "llama3" (Llama-3.1+) keeps high frequencies, divides low
    frequencies by `factor`, and smoothly interpolates between
    (transformers modeling_rope_utils._compute_llama3_parameters)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    if scaling is not None:
        kind, factor = scaling[0], scaling[1]
        if kind == "linear":
            inv_freq = inv_freq / factor
        elif kind == "llama3":
            _, factor, low_f, high_f, orig = scaling
            import math

            low_wl = orig / low_f
            high_wl = orig / high_f
            wavelen = 2.0 * math.pi / inv_freq
            scaled = inv_freq / factor
            smooth = (orig / wavelen - low_f) / (high_f - low_f)
            smoothed = (1.0 - smooth) * scaled + smooth * inv_freq
            inv_freq = jnp.where(
                wavelen > low_wl, scaled,
                jnp.where(wavelen < high_wl, inv_freq, smoothed))
        elif kind == "longrope":
            # phi3: per-frequency ext factors + attention-factor cos/sin
            # scale (transformers _compute_longrope_parameters)
            _, factors, att = scaling
            inv_freq = inv_freq / jnp.asarray(factors, jnp.float32)
            angles = positions.astype(jnp.float32)[..., None] * inv_freq
            return jnp.cos(angles) * att, jnp.sin(angles) * att
        else:
            raise ValueError(f"unsupported rope scaling {kind}")
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., dim/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jax.Array,               # [B, T, H, D]
    cos: jax.Array,             # [T, rot/2] or [B, T, rot/2]
    sin: jax.Array,
    style: str = "neox",
    rotary_dim: Optional[int] = None,
) -> jax.Array:
    """Apply rotary embedding. 'neox' = rotate-half (llama/qwen/falcon),
    'gptj' = rotate-every-two (gptj/chatglm first half), 'none' = identity
    (OPT-style learned-position models)."""
    if style == "none":
        return x
    D = x.shape[-1]
    rot = rotary_dim or D
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    # broadcast cos/sin over head axis: [*, T, 1, rot/2]
    c = jnp.expand_dims(cos, axis=-2)
    s = jnp.expand_dims(sin, axis=-2)
    if c.ndim == x.ndim - 1:      # [T, 1, r/2] -> [1, T, 1, r/2]
        c, s = c[None], s[None]
    xf = x_rot.astype(jnp.float32)
    if style == "neox":
        x1, x2 = jnp.split(xf, 2, axis=-1)
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.concatenate([o1, o2], axis=-1)
    elif style == "gptj":
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    else:
        raise ValueError(f"unknown rope style {style}")
    out = out.astype(x.dtype)
    if rot < D:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def apply_rope_flat(
    x: jax.Array,               # [B, T, n_heads * D] — the raw projection
    cos: jax.Array,             # [T, D/2] or [B, T, D/2]
    sin: jax.Array,
    head_dim: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Rotate-half ('neox') rope applied on the FLAT projection output,
    without reshaping the activation to per-head [B, T, n, D] form.

    Why this exists: at the B=512 decode headline the q/k GEMM emits
    [B, n*D] in (B-sublane, lane) tiling; reshaping to per-head form
    before rope makes XLA relayout the 8MB tensor into a (B, D)-tile
    domain for rope and again into the (head, D)-tile domain for the
    cache/scores — 2 layout copies per projection per layer, ~1GB/step
    of pure copy traffic (the ~3.8ms 'glue' slice of PROFILE_r04 §3.3).
    Formulated flat, rope is elementwise over the GEMM's own layout:
    for channel n = h*D + j,
        out[n] = x[n] * C[n] + partner(x)[n] * S[n]
        C[n] = cos[j mod D/2]
        S[n] = -sin[j] if j < D/2 else sin[j - D/2]
        partner(n) = h*D + (j + D/2) mod D
    partner is a roll of D/2 within each D-lane block — with D a
    multiple of the 128-lane tile this is an in-tile lane rotation, and
    XLA fuses the reshape-roll-reshape into the surrounding loop fusion
    instead of materializing a per-head relayout. Bit-identical to
    apply_rope(style='neox') in f32 (same multiply/add operand values;
    a-b == a+(-b) in IEEE).
    """
    D = head_dim
    *lead, N = x.shape
    xf = x.astype(compute_dtype)
    c = cos.astype(compute_dtype)
    s = sin.astype(compute_dtype)
    # per-channel coefficient vectors over one head: [..., D]
    c_d = jnp.concatenate([c, c], axis=-1)
    s_d = jnp.concatenate([-s, s], axis=-1)
    # broadcast over heads then flatten — small tensors ([T, D] or
    # [B, T, D]); the broadcast+reshape fuses as index arithmetic
    h = N // D
    c_full = jnp.broadcast_to(c_d[..., None, :], (*c_d.shape[:-1], h, D))
    s_full = jnp.broadcast_to(s_d[..., None, :], (*s_d.shape[:-1], h, D))
    c_full = c_full.reshape(*c_d.shape[:-1], N)
    s_full = s_full.reshape(*s_d.shape[:-1], N)
    partner = jnp.roll(xf.reshape(*lead, h, D), D // 2, axis=-1)
    partner = partner.reshape(*lead, N)
    return (xf * c_full + partner * s_full).astype(x.dtype)


def alibi_slopes(n_heads: int) -> jax.Array:
    """Per-head ALiBi slopes (the train-short-test-long additive bias;
    reference consumes them baked into Baichuan-13B's additive attention_mask,
    modules/fused/attn.py:283-470). Matches the canonical formula (also HF
    falcon's build_alibi_tensor): geometric sequence from
    2^(-8/closest_pow2), with interleaved extra slopes for non-power-of-2
    head counts."""
    import math

    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** i for i in range(1, closest + 1)]
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        slopes += [extra_base ** i
                   for i in range(1, 2 * (n_heads - closest) + 1, 2)]
    return jnp.asarray(slopes, jnp.float32)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@_dc.dataclass(frozen=True)
class KVCache:
    """Static-shape per-model KV cache — the reference's dead `WindowedCache`
    design (fused/cache.py:3-38) done properly: preallocated
    [L, B, S_max, n_kv, hd], updated in place via dynamic_update_slice and
    donated across decode steps (no HF dynamic Cache reallocation).

    Supports int8 storage with per-(token, head) absmax scales: decode is
    HBM-bandwidth-bound and the KV read is a large share of the bytes, so
    int8 KV halves that traffic (and doubles the batch that fits). The
    reference keeps KV fp16 (attn.py:242-244); int8-KV is a TPU-side win the
    A100 baseline doesn't have.

    `head_major=True` switches the layout to [L, n_kv, B, S, hd] (scales
    [L, n_kv, B, S]) — each (head, row) owns a contiguous [S, hd] stripe, the
    layout the flash-decode Pallas kernel streams with one linear DMA per
    block (ops/pallas/flash_decode.py). It is a STATIC pytree meta field:
    jit specializes on it and tree_maps require both sides to agree.

    `tail_r=R` (head-major only) additionally allocates a token-major
    STAGING buffer [L, R, B, n_kv, hd] covering positions
    [tail_base, length): EVERY write into the big head-major cache at a
    dynamic offset lowers to a whole-array pass on this stack (measured:
    the direct single-token write costs ~0.39 ms/layer at 7B B=256 S=32
    and grows ~linearly with S — PROFILE_r02.md), so the decode program
    never writes the main cache at all. Tokens stage in the tail (a
    contiguous [B, h, hd] plane write at the window slot), the flash
    kernel attends main[0:tail_base) + tail[0:length-tail_base) in one
    online softmax, and the ENGINE calls `flush_tail()` — a separate
    jitted program — exactly when the window fills, amortizing the
    whole-array DUS cost R-fold. Tail slots hold the same quantized
    values a direct write would produce, so flushing is a pure relayout
    and results are bit-identical to the unstaged path.

    Two designs that measured WORSE on this stack, do not resurrect:
    a lax.cond flush inside the decode step (XLA cannot alias the 4GB
    cache operands through a conditional — 8.7GB of per-step copy.*
    temps, OOM at 7B B=256 S=128), and re-writing the whole window into
    main every step (the unaligned-offset span DUS costs a whole-array
    pass per layer per step: +0.77 ms/layer at S=128, +2.9 at S=512).
    """

    k: jax.Array               # [L, B, S, n_kv, hd] | [L, n_kv, B, S, hd]
    v: jax.Array
    k_scale: Optional[jax.Array]   # [L, B, S, n_kv] | [L, n_kv, B, S] (int8)
    v_scale: Optional[jax.Array]
    length: jax.Array          # [] int32 — valid prefix length
    head_major: bool = _dc.field(default=False,
                                 metadata=dict(static=True))
    k_tail: Optional[jax.Array] = None   # [L, R, B, n_kv, hd]
    v_tail: Optional[jax.Array] = None
    kt_scale: Optional[jax.Array] = None  # [L, B, R, n_kv] (int8 KV)
    vt_scale: Optional[jax.Array] = None
    tail_base: Optional[jax.Array] = None  # [] i32 — tokens in MAIN (= the
                                           # tail window's first position;
                                           # prefill and flush advance it).
                                           # [B] i32 for slot-mode pools
                                           # (per-row windows; continuous
                                           # batching inserts reset rows)

    def _replace(self, **kw) -> "KVCache":
        return _dc.replace(self, **kw)

    @classmethod
    def create(cls, n_layers, batch, max_seq, n_kv, head_dim,
               dtype=jnp.bfloat16, head_major: bool = False,
               tail_r: int = 0, per_row_tail: bool = False):
        dtype = jnp.dtype(dtype)
        if head_major:
            shape = (n_layers, n_kv, batch, max_seq, head_dim)
            # scales' S dim padded to %128: the flash kernel DMAs per-row
            # scale stripes and Mosaic requires the copied last dim
            # 128-aligned (flash_decode.py); pad slots are never written
            # and masked out of the scores
            sc_shape = (n_layers, n_kv, batch, -(-max_seq // 128) * 128)
        else:
            shape = (n_layers, batch, max_seq, n_kv, head_dim)
            sc_shape = shape[:-1]
        quantized = dtype == jnp.int8
        if tail_r and not head_major:
            raise ValueError("tail_r staging requires head_major=True")
        tail_kw = {}
        if tail_r:
            t_shape = (n_layers, tail_r, batch, n_kv, head_dim)
            ts_shape = (n_layers, batch, tail_r, n_kv)
            tail_kw = dict(
                k_tail=jnp.zeros(t_shape, dtype),
                v_tail=jnp.zeros(t_shape, dtype),
                kt_scale=(jnp.ones(ts_shape, jnp.float32)
                          if quantized else None),
                vt_scale=(jnp.ones(ts_shape, jnp.float32)
                          if quantized else None),
                tail_base=jnp.zeros((batch,) if per_row_tail else (),
                                    jnp.int32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            k_scale=jnp.ones(sc_shape, jnp.float32) if quantized else None,
            v_scale=jnp.ones(sc_shape, jnp.float32) if quantized else None,
            length=jnp.zeros((), jnp.int32),
            head_major=head_major,
            **tail_kw,
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[3] if self.head_major else self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[2] if self.head_major else self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def update_layer(
        self, layer: int, k_new: jax.Array, v_new: jax.Array,
        ring: bool = False,
    ) -> "KVCache":
        """Write [B, T, n_kv, hd] at the current length offset for `layer`.
        Length advance happens once per step via `advance`.

        ring=True reclaims slots for sliding-window models (the reference's
        WindowedCache.roll_kv, fused/cache.py:25-34, without the copy): writes
        land at position % S, so a window-sized cache serves unbounded decode.
        attend() reconstructs each slot's absolute position from the valid
        length, so masks stay correct across wraps."""
        T = k_new.shape[1]
        S = self.max_seq
        hm = self.head_major

        if self.k_tail is not None and T == 1 and not ring:
            return self._update_tail(layer, k_new, v_new)

        def kv_form(x):      # [B,T,n_kv,hd] -> storage layout
            return jnp.moveaxis(x, 2, 0) if hm else x

        def sc_form(s):      # [B,T,n_kv] -> storage layout
            return jnp.transpose(s, (2, 0, 1)) if hm else s

        if self.quantized:
            qk, sk = Q.quantize_kv(k_new)
            qv, sv = Q.quantize_kv(v_new)
        else:
            qk, qv = k_new.astype(self.k.dtype), v_new.astype(self.v.dtype)
            sk = sv = None

        if ring and T > 1:
            # chunk may straddle the wrap point: scatter at per-token slots.
            # NB: an advanced index separated from the int layer index by
            # slices puts the broadcast (T) dim FIRST in the result, so the
            # head-major scatter value is [T, n_kv, B, hd].
            slots = (self.length + jnp.arange(T, dtype=jnp.int32)) % S
            if hm:
                kv_at = lambda buf, val: buf.at[layer, :, :, slots].set(
                    jnp.transpose(val, (1, 2, 0, 3)).astype(buf.dtype))
                sc_at = lambda buf, val: buf.at[layer, :, :, slots].set(
                    jnp.transpose(val, (1, 2, 0)))
            else:
                kv_at = lambda buf, val: buf.at[layer, :, slots].set(
                    jnp.moveaxis(val, 0, 1).astype(buf.dtype))
                sc_at = lambda buf, val: buf.at[layer, :, slots].set(
                    jnp.moveaxis(val, 0, 1))
            out = self._replace(k=kv_at(self.k, qk), v=kv_at(self.v, qv))
            if self.quantized:
                out = out._replace(k_scale=sc_at(self.k_scale, sk),
                                   v_scale=sc_at(self.v_scale, sv))
            return out

        pos = self.length % S if ring else self.length
        at5 = (layer, 0, 0, pos, 0) if hm else (layer, 0, pos, 0, 0)
        at4 = (layer, 0, 0, pos) if hm else (layer, 0, pos, 0)
        out = self._replace(
            k=jax.lax.dynamic_update_slice(
                self.k, kv_form(qk)[None].astype(self.k.dtype), at5),
            v=jax.lax.dynamic_update_slice(
                self.v, kv_form(qv)[None].astype(self.v.dtype), at5),
        )
        if self.quantized:
            out = out._replace(
                k_scale=jax.lax.dynamic_update_slice(
                    self.k_scale, sc_form(sk)[None], at4),
                v_scale=jax.lax.dynamic_update_slice(
                    self.v_scale, sc_form(sv)[None], at4),
            )
        return out

    def _update_tail(self, layer: int, k_new, v_new) -> "KVCache":
        """Decode-step write: stage the token in the token-major tail at
        its window slot (a contiguous [B, n_kv, hd] plane write — the
        main cache is NOT touched; the engine flushes full windows via
        `flush_tail`). The `% R` keeps the write in-bounds if a caller
        drives forward() past a full window without flushing, but the
        overwritten window tokens would then be lost — the engine/bench
        decode loops flush on time."""
        R = self.k_tail.shape[1]
        slot = (self.length - self.tail_base) % R

        if self.quantized:
            qk, sk = Q.quantize_kv(k_new[:, 0])   # [B, n_kv, hd], [B, n_kv]
            qv, sv = Q.quantize_kv(v_new[:, 0])
        else:
            qk, qv = k_new[:, 0], v_new[:, 0]
            sk = sv = None

        at = (layer, slot, 0, 0, 0)
        out = self._replace(
            k_tail=jax.lax.dynamic_update_slice(
                self.k_tail, qk[None, None].astype(self.k_tail.dtype), at),
            v_tail=jax.lax.dynamic_update_slice(
                self.v_tail, qv[None, None].astype(self.v_tail.dtype), at),
        )
        if self.quantized:
            s_at = (layer, 0, slot, 0)          # scales are [L, B, R, n_kv]
            out = out._replace(
                kt_scale=jax.lax.dynamic_update_slice(
                    self.kt_scale, sk[None, :, None], s_at),
                vt_scale=jax.lax.dynamic_update_slice(
                    self.vt_scale, sv[None, :, None], s_at),
            )
        return out

    def _update_tail_slots(self, layer: int, k_new, v_new,
                           slot_lengths) -> "KVCache":
        """Slot-mode (continuous batching) decode write into the tail:
        each row stages its token(s) at its own window slot(s)
        (slot_lengths[b] - tail_base[b] + t) % R — a small scatter into
        the tail buffer instead of the whole-array-pass scatter into
        main.

        T > 1 (speculative-verify steps, VERDICT r4 item 3): row b's T
        tokens stage at consecutive window slots; the flash kernel's
        tail attend covers them with per-query tail_lens (see
        decoder.attend_over's verify branch). The engine must flush
        before a verify span would overflow the window (occupancy + T
        <= R) — the % R wrap otherwise overwrites older staged slots."""
        R = self.k_tail.shape[1]
        B, T = k_new.shape[0], k_new.shape[1]
        rows = jnp.arange(B)[:, None]                       # [B, 1]
        slots = ((slot_lengths[:, None] - self.tail_base[:, None]
                  + jnp.arange(T, dtype=jnp.int32)[None]) % R)   # [B, T]

        if self.quantized:
            qk, sk = Q.quantize_kv(k_new)   # [B, T, n_kv, hd], [B, T, n_kv]
            qv, sv = Q.quantize_kv(v_new)
        else:
            qk, qv = k_new, v_new
            sk = sv = None

        # tail [L, R, B, h, d]: adjacent advanced indices (slots, rows)
        # keep their place -> value shape [B, T, h, d]
        t_at = lambda buf, val: buf.at[layer, slots, rows].set(
            val.astype(buf.dtype))
        out = self._replace(k_tail=t_at(self.k_tail, qk),
                            v_tail=t_at(self.v_tail, qv))
        if self.quantized:
            # scales [L, B, R, h]
            s_at = lambda buf, val: buf.at[layer, rows, slots].set(val)
            out = out._replace(kt_scale=s_at(self.kt_scale, sk),
                               vt_scale=s_at(self.vt_scale, sv))
        return out

    def flush_tail(self, row_lengths: Optional[jax.Array] = None
                   ) -> "KVCache":
        """Write the staged tail window into the head-major main cache
        and advance tail_base. Meant to be jitted as its OWN program and
        called by the engine once per R decode steps: the dynamic-offset
        write into the big cache costs a whole-array pass on this stack
        (class docstring), so it must never run per step. Partial
        windows flush safely (stale slots land at positions >= the row's
        length, which attention masks), resetting the window.

        Uniform caches (scalar tail_base) use the cache's own `length`;
        slot-mode pools (tail_base [B]) pass per-row `row_lengths`."""
        R = self.k_tail.shape[1]
        base = self.tail_base
        # tail [L, R, B, n_kv, hd] -> head-major [L, n_kv, B, R, hd]
        kq = jnp.transpose(self.k_tail, (0, 3, 2, 1, 4))
        vq = jnp.transpose(self.v_tail, (0, 3, 2, 1, 4))
        if base.ndim == 0:
            out = self._replace(
                k=jax.lax.dynamic_update_slice(self.k, kq, (0, 0, 0, base, 0)),
                v=jax.lax.dynamic_update_slice(self.v, vq, (0, 0, 0, base, 0)),
                tail_base=jnp.minimum(base + R, self.length),
            )
            if self.quantized:
                ks = jnp.transpose(self.kt_scale, (0, 3, 1, 2))  # [L,h,B,R]
                vs = jnp.transpose(self.vt_scale, (0, 3, 1, 2))
                out = out._replace(
                    k_scale=jax.lax.dynamic_update_slice(
                        self.k_scale, ks, (0, 0, 0, base)),
                    v_scale=jax.lax.dynamic_update_slice(
                        self.v_scale, vs, (0, 0, 0, base)),
                )
            return out
        # per-row windows: scatter each row's R-span at its own base;
        # out-of-range positions (rows near max_seq) are dropped
        B = base.shape[0]
        rows = jnp.arange(B)[:, None]                  # [B, 1]
        pos = base[:, None] + jnp.arange(R)[None]      # [B, R]
        # Layered flush (MIXQ_FLUSH_LAYERED, default auto): the fused
        # whole-cache scatter materializes a RELAYOUT COPY of the full
        # k (and v) array as an HLO temp — 3.0G at 192 slots x 128, the
        # buffer that binds the capacity frontier (PROFILE_r05 §2.3
        # memprobe: flush temp=3.000G; XLA transposes the big operand to
        # match the token-major updates' layout instead of the reverse).
        # Scattering one layer at a time caps the temp at 1/L of that —
        # but it is NOT free: the measured knee control (128 slots x 128,
        # 2.1G/array) LOSES 38% under layered (1,663.7 vs 2,701.0 tok/s,
        # SERVE_CAP_R05 cap_slots128_s128_layered — the L serialized
        # scatters cost far more device time than the one fused scatter
        # they replace). auto therefore enables layered only past the
        # fused flush's measured compile-OOM boundary (192 slots x 128 =
        # 3.1G/array OOMs at 17.48G; 2.1G compiles and wins), i.e. where
        # the choice is layered-or-nothing: threshold 2.5G.
        import os as _os

        _lay = _os.environ.get("MIXQ_FLUSH_LAYERED", "auto")
        layered = (_lay == "1" or
                   (_lay == "auto" and self.k.size * self.k.dtype.itemsize
                    >= (5 << 29)))
        if layered:
            def kv_at(buf, val):
                for l in range(buf.shape[0]):
                    # the scalar layer index is itself an ADVANCED index,
                    # and with the h-slice between it and (rows, pos) the
                    # advanced dims move to the front: the update must be
                    # [B, R, h(, d)], not [h, B, R(, d)]
                    upd = val[l].astype(buf.dtype)
                    upd = jnp.transpose(
                        upd, (1, 2, 0, 3) if upd.ndim == 4 else (1, 2, 0))
                    buf = buf.at[l, :, rows, pos].set(upd, mode="drop")
                return buf
        else:
            kv_at = lambda buf, val: buf.at[:, :, rows, pos].set(
                val.astype(buf.dtype), mode="drop")
        out = self._replace(
            k=kv_at(self.k, kq), v=kv_at(self.v, vq),
            tail_base=jnp.minimum(
                base + R,
                row_lengths if row_lengths is not None else base + R),
        )
        if self.quantized:
            ks = jnp.transpose(self.kt_scale, (0, 3, 1, 2))
            vs = jnp.transpose(self.vt_scale, (0, 3, 1, 2))
            out = out._replace(k_scale=kv_at(self.k_scale, ks),
                               v_scale=kv_at(self.v_scale, vs))
        return out

    def update_layer_slots(
        self, layer: int, k_new: jax.Array, v_new: jax.Array,
        slot_lengths: jax.Array, ring: bool = False,
    ) -> "KVCache":
        """Decode-step write at per-row positions (continuous batching):
        k_new [B, 1, n_kv, hd] scattered to [layer, b, slot_lengths[b]].
        Tail-staged pools stage in the window buffer instead (the big
        per-row scatter is the whole-array-pass cost flush_tail
        amortizes).

        T > 1 (speculative-verify steps): each row's T tokens scatter to
        its own span [slot_lengths[b], slot_lengths[b] + T); rows whose
        span would run past max_seq drop the overflow (mode="drop") —
        the engine never accepts tokens past a row's budget anyway.
        Batch-major caches only (the head-major flash layout's T>1 path
        serves fresh-cache prefill, and ring wrap points are per-row)."""
        T = k_new.shape[1]
        if self.k_tail is not None and not ring:
            # T == 1: plain decode staging; T > 1: speculative-verify
            # staging (all T tokens land in the row's window — the
            # engine flushes beforehand so occupancy + T <= R)
            return self._update_tail_slots(layer, k_new, v_new, slot_lengths)
        B = k_new.shape[0]
        rows = jnp.arange(B)
        if T > 1:
            if self.head_major or ring:
                raise NotImplementedError(
                    "T>1 slot-mode KV writes (speculative verify) need a "
                    "batch-major non-ring cache, or a tail-staged "
                    "(per-row window) pool")
            pos = slot_lengths[:, None] + jnp.arange(T,
                                                     dtype=jnp.int32)[None]
            kv_at = lambda buf, val: buf.at[layer, rows[:, None], pos].set(
                val.astype(buf.dtype), mode="drop")
            if self.quantized:
                qk, sk = Q.quantize_kv(k_new)       # [B,T,h,d] / [B,T,h]
                qv, sv = Q.quantize_kv(v_new)
                return self._replace(
                    k=kv_at(self.k, qk), v=kv_at(self.v, qv),
                    k_scale=kv_at(self.k_scale, sk),
                    v_scale=kv_at(self.v_scale, sv),
                )
            return self._replace(k=kv_at(self.k, k_new),
                                 v=kv_at(self.v, v_new))
        if ring:
            slot_lengths = slot_lengths % self.max_seq
        hm = self.head_major
        if hm:
            # broadcast (B) dim of the separated advanced indices lands
            # first: the scatter value keeps its natural [B, n_kv, hd] shape
            kv_at = lambda buf, val: buf.at[layer, :, rows, slot_lengths].set(
                val.astype(buf.dtype))
            sc_at = lambda buf, val: buf.at[layer, :, rows, slot_lengths].set(
                val)
        else:
            kv_at = lambda buf, val: buf.at[layer, rows, slot_lengths].set(
                val.astype(buf.dtype))
            sc_at = lambda buf, val: buf.at[layer, rows, slot_lengths].set(val)
        if self.quantized:
            qk, sk = Q.quantize_kv(k_new[:, 0])
            qv, sv = Q.quantize_kv(v_new[:, 0])
            return self._replace(
                k=kv_at(self.k, qk), v=kv_at(self.v, qv),
                k_scale=sc_at(self.k_scale, sk),
                v_scale=sc_at(self.v_scale, sv),
            )
        return self._replace(
            k=kv_at(self.k, k_new[:, 0]), v=kv_at(self.v, v_new[:, 0]))

    def layer_kv(self, layer: int):
        """(k, v, k_scale, v_scale) views for one layer."""
        if self.quantized:
            return (self.k[layer], self.v[layer],
                    self.k_scale[layer], self.v_scale[layer])
        return self.k[layer], self.v[layer], None, None

    def advance(self, t: int) -> "KVCache":
        out = self._replace(length=self.length + t)
        if self.tail_base is not None and t != 1:
            # prefill chunks (t>1) write main directly; the next decode
            # window starts fresh at the new length (broadcast keeps
            # per-row [B] windows per-row)
            out = out._replace(tail_base=jnp.broadcast_to(
                jnp.asarray(self.length + t, jnp.int32),
                self.tail_base.shape))
        return out


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def attend_chunked(
    q: jax.Array,              # [B, T, n_q, D]
    k: jax.Array,
    v: jax.Array,
    q_slot: jax.Array,
    kv_valid_len: jax.Array,
    kv_start: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    chunk: int = 256,
    alibi: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    ring: bool = False,
) -> jax.Array:
    """Query-chunked attention for long prefill: identical math to attend(),
    but scores materialize per query block ([B, h, g, chunk, S] instead of
    [B, h, g, T, S]) — memory O(T*S/chunk-blocks) -> O(chunk*S) per step.
    The flash-attention memory property via lax.map over query chunks; the
    KV side stays resident (it must be written to the cache anyway)."""
    B, T, n_q, D = q.shape
    if T % chunk != 0 or q_slot.ndim != 1:
        return attend(q, k, v, q_slot, kv_valid_len, kv_start,
                      sliding_window, k_scale, v_scale, alibi=alibi,
                      scale=scale, softcap=softcap, ring=ring)
    n_chunks = T // chunk
    q_c = q.reshape(B, n_chunks, chunk, n_q, D)
    slot_c = q_slot.reshape(n_chunks, chunk)

    def one(args):
        q_i, slot_i = args
        return attend(q_i, k, v, slot_i, kv_valid_len, kv_start,
                      sliding_window, k_scale, v_scale, alibi=alibi,
                      scale=scale, softcap=softcap, ring=ring)

    out = jax.lax.map(one, (jnp.moveaxis(q_c, 1, 0), slot_c))
    return jnp.moveaxis(out, 0, 1).reshape(B, T, n_q, D)


def attend(
    q: jax.Array,              # [B, T, n_q, D]
    k: jax.Array,              # [B, S, n_kv, D] (full static cache incl. new)
    v: jax.Array,              # [B, S, n_kv, D]
    q_slot: jax.Array,         # [T] int32 — cache-slot indices of the queries
    kv_valid_len: jax.Array,   # [] int32 — number of valid cache slots
    kv_start: Optional[jax.Array] = None,  # [B] int32 — first real slot per
                               # row (left-padded prompts); slots before it
                               # are masked out
    sliding_window: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,   # [B, S, n_kv] (int8 KV)
    v_scale: Optional[jax.Array] = None,
    int8_compute: bool = False,  # quantize q/probs so both contractions run
                               # int8 x int8 on the MXU (needs int8 KV) —
                               # no K/V widening at all
    alibi: Optional[jax.Array] = None,  # [n_q] per-head ALiBi slopes; adds
                               # slope * (kv_pos - q_pos) to the scores
                               # (relative form — shift-invariant under
                               # softmax, so left-padding needs no special
                               # casing). Replaces rotary (Baichuan-13B).
    scale: Optional[float] = None,  # score scale; default 1/sqrt(head_dim)
                               # (gemma2 uses query_pre_attn_scalar^-0.5)
    softcap: Optional[float] = None,  # gemma2 attn_logit_softcapping:
                               # scores = tanh(scores/cap) * cap
    ring: bool = False,        # ring-buffer KV (sliding-window reclaim):
                               # slot s holds absolute position
                               # s + S*floor((len-1-s)/S); masks are computed
                               # in absolute-position space, so a window-sized
                               # cache decodes unboundedly
) -> jax.Array:
    """Masked multi-head attention over a static-shape KV buffer.

    GQA is handled by grouping query heads against shared KV heads in the
    einsum (no repeat_kv materialization — the reference materializes,
    mistral_attn.py:76-86, which wastes HBM bandwidth).
    Replaces flash_attn_func / varlen (attn.py:116-204): padded slots are
    masked instead of unpadded, keeping shapes static for XLA.
    """
    B, T, n_q, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    groups = n_q // n_kv
    if scale is None:
        scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)

    # Operands stay in their storage dtype (int8 KV / bf16) with f32 MXU
    # accumulation — converting the KV buffers to f32 would quadruple the
    # HBM traffic that dominates decode.
    # (CPU XLA lacks bf16xbf16->f32 dot thunks, so tests use f32 operands
    # there; on TPU bf16 operands halve any operand materialization.)
    op_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    # MIXQ_ATTN_ACC=bf16: accumulate the two attention contractions in bf16.
    # XLA lowers T=1 decode einsums to a VPU convert+multiply+REDUCE fusion
    # (no MXU dot — optimized-HLO evidence, PROFILE_r02/r04); f32
    # accumulation doubles that fusion's per-element VPU work on the
    # step-dominating KV read. bf16 partials over <=max_seq terms are an
    # accuracy trade — A/B knob, not a default (PPL gate prices it).
    acc_dtype = (jnp.bfloat16
                 if _os.environ.get("MIXQ_ATTN_ACC", "f32") == "bf16"
                 and jax.default_backend() != "cpu" else jnp.float32)
    qf = q.reshape(B, T, n_kv, groups, D)

    # scores: [B, n_kv, groups, T, S]. For int8 KV, the per-(token, head)
    # scales are applied AFTER the contraction (on the small scores/probs
    # tensors), so the big KV buffers are read as int8 and never expanded
    # to fp in HBM.
    use_int8 = int8_compute and k.dtype == jnp.int8 and k_scale is not None
    if use_int8:
        # per-(b,t,h,g) absmax-int8 q: both operands of the QK contraction
        # are int8, so the MXU reads the cache natively (SageAttention-style)
        q_absmax = jnp.max(jnp.abs(qf.astype(jnp.float32)), axis=-1,
                           keepdims=True)
        q_sc = jnp.maximum(q_absmax / 127.0, 1e-8)
        q_i8 = jnp.clip(jnp.round(qf / q_sc), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("bthgd,bshd->bhgts", q_i8, k,
                         preferred_element_type=jnp.int32)
        # q_sc: [B,T,h,g,1] -> [B,h,g,T,1]
        scores = acc.astype(jnp.float32) * jnp.transpose(
            q_sc, (0, 2, 3, 1, 4)) * scale
    else:
        scores = jnp.einsum(
            "bthgd,bshd->bhgts", qf.astype(op_dtype), k.astype(op_dtype),
            preferred_element_type=acc_dtype).astype(jnp.float32) * scale
    if k_scale is not None:
        scores = scores * jnp.transpose(
            k_scale, (0, 2, 1))[:, :, None, None, :]         # [B,h,1,1,S]
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap

    # q_slot may be [T] (uniform batch) or [B, T] (per-slot positions for
    # continuous batching); kv_valid_len may be scalar or [B]
    q_slot_b = q_slot if q_slot.ndim == 2 else q_slot[None]          # [B?,T]
    len_b0 = jnp.asarray(kv_valid_len)
    len_b0 = len_b0 if len_b0.ndim == 1 else len_b0[None]            # [B?]
    if ring:
        # absolute position stored in each ring slot; slots never written
        # (len <= s) come out negative and are masked by `valid`
        s_idx = jnp.arange(S, dtype=jnp.int32)[None]                 # [1,S]
        kv_pos = (s_idx + S * jnp.floor_divide(
            len_b0[:, None] - 1 - s_idx, S))[:, None, :]             # [B?,1,S]
    else:
        kv_pos = jnp.arange(S, dtype=jnp.int32)[None, None, :]      # [1,1,S]
    if alibi is not None:
        # additive bias slope_h * (kv_pos - q_pos) <= 0 on the causal part;
        # [n_q] slopes grouped to [n_kv, groups] to match the score layout
        sl = alibi.reshape(n_kv, groups)
        dist = (kv_pos - q_slot_b[:, :, None]).astype(jnp.float32)   # [B?,T,S]
        scores = scores + (sl[:, :, None, None]
                           * dist[:, None, None, :, :])              # [B?,h,g,T,S]
    causal = kv_pos <= q_slot_b[:, :, None]                          # [B?,T,S]
    valid = kv_pos < len_b0[:, None, None]
    if ring:
        valid = valid & (kv_pos >= 0)   # never-written slots come out < 0
    mask = causal & valid                                            # [B?,T,S]
    if kv_start is not None:
        mask = mask & (kv_pos >= kv_start[:, None, None])
    if sliding_window is not None:
        mask = mask & (kv_pos > q_slot_b[:, :, None] - sliding_window)
    scores = jnp.where(mask[:, None, None], scores, -1e30)

    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * jnp.transpose(
            v_scale, (0, 2, 1))[:, :, None, None, :]
    if use_int8:
        # probs >= 0: per-(b,h,g,t) absmax-int8; PV contraction int8 too
        p_absmax = jnp.max(probs, axis=-1, keepdims=True)
        p_sc = jnp.maximum(p_absmax / 127.0, 1e-12)
        p_i8 = jnp.clip(jnp.round(probs / p_sc), 0, 127).astype(jnp.int8)
        acc = jnp.einsum("bhgts,bshd->bthgd", p_i8, v,
                         preferred_element_type=jnp.int32)
        # p_sc: [B,h,g,T,1] -> [B,T,h,g,1]
        out = acc.astype(jnp.float32) * jnp.transpose(p_sc, (0, 3, 1, 2, 4))
    else:
        out = jnp.einsum(
            "bhgts,bshd->bthgd", probs.astype(op_dtype),
            v.astype(op_dtype), preferred_element_type=acc_dtype)
    return out.reshape(B, T, n_q, D).astype(q.dtype)
