"""Core quantization primitives (pure jnp; XLA fuses these well on TPU).

Reimplements, TPU-first, the quantization math of the reference's external
CUDA kernels:
  - per-out-channel weight quant: mixquant/modules/linear.py:113-144
  - per-token (row) activation quant: mixlib.FindRowScale (linear.py:190-193)
  - int4 pack (2 nibbles / uint8): linear.py:14-23 (pack_to_i4 / unpack)
  - QUIK asymmetric quant + zero-point row-sum correction:
    mixquant/modules/qlinear.py:106-150,195-198
  - outlier selection from calibration scales: mixquant/quantize/mixquant.py:136

Design difference from the reference (deliberate, for XLA static shapes):
outlier sets are a *fixed budget* of padded indices + a dense inlier mask over
K, instead of a dynamically growing index tensor (linear.py:200-227). "Fewer
outliers than budget" = trailing mask zeros; same math, static shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Weight quantization (offline, per output channel)
# ---------------------------------------------------------------------------

def quantize_weight_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-out-channel int8 weight quant.

    w: [K, N] (in-dim, out-dim — note: transposed vs torch Linear [N, K]).
    Returns (q_w int8 [K, N], scale [N] f32) with scale = max|w|/127
    (reference linear.py:113-119).
    """
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight_int4(
    w: jax.Array, clip_scale_denom: float = 7.0
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-out-channel int4 weight quant (unpacked, int8 storage).

    Reference uses max|w|/10 with clamp [-8,7] for the MIX path
    (linear.py:131-137) and max|w|/7 for QUIK (mixquant.py:150). We default to
    /7 (full int4 range, strictly better) and keep the denom configurable.
    Returns (q_w int8 in [-8,7] [K, N], scale [N] f32).
    """
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / clip_scale_denom
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[None, :]), -8, 7).astype(jnp.int8)
    return q, scale


def quantize_weight_grouped(
    w: jax.Array, bits: int = 4, group_size: int = 128
) -> Tuple[jax.Array, jax.Array]:
    """Group-wise symmetric weight quant: one scale per (K-group, out-channel)
    (the reference's q_group_size / pseudo_quantize_tensor surface,
    quant_config.json {"q_group_size"} + mixquant.py:284-318).

    w: [K, N] -> (q int8 [K, N], scale f32 [K//group_size, N]).
    """
    K, N = w.shape
    assert K % group_size == 0, f"K={K} not divisible by group {group_size}"
    qmax = 127.0 if bits == 8 else 7.0
    wg = w.astype(jnp.float32).reshape(K // group_size, group_size, N)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / qmax, 1e-8)  # [G, N]
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -qmax - 1, qmax)
    return q.reshape(K, N).astype(jnp.int8), scale


def grouped_int8_matmul_dequant(
    q_x: jax.Array,             # int8 [M, K]
    x_scale: jax.Array,         # f32 [M, 1]
    q_w: jax.Array,             # int8 [K, N]
    w_scale_g: jax.Array,       # f32 [G, N]
    out_dtype=jnp.float32,
) -> jax.Array:
    """Int8 GEMM with per-group weight scales: split the contraction into G
    group-batched MXU matmuls and fold each group's scale into its partial
    sum (the TPU shape of a group-quantized GEMM epilogue)."""
    M, K = q_x.shape
    G, N = w_scale_g.shape
    Kg = K // G
    xg = q_x.reshape(M, G, Kg)
    wg = q_w.reshape(G, Kg, N)
    acc = jnp.einsum("mgk,gkn->gmn", xg, wg,
                     preferred_element_type=jnp.int32)        # [G, M, N]
    y = jnp.sum(acc.astype(jnp.float32) * w_scale_g[:, None, :], axis=0)
    return (y * x_scale).astype(out_dtype)


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int4 values (int8 storage, [-8,7]) 2-per-byte along axis 0.

    q: [K, N] -> packed uint8 [K//2, N] in HALVES layout: row k in the low
    nibble, row k + K//2 in the high nibble. The halves layout makes the
    in-kernel unpack a contiguous sublane concat (lo block = rows
    [0, K/2), hi block = rows [K/2, K)) — no strided interleave — so the
    Pallas W4 matmul prologue (ops/pallas/mix_gemm.py) reconstructs the
    natural row order with two masks and one concatenate. (Reference packs
    along the in-dim too: linear.py:14-23.)
    """
    K = q.shape[0]
    assert K % 2 == 0, "K must be even to pack int4"
    half = K // 2
    lo = (q[:half] & 0x0F).astype(jnp.uint8)
    hi = (q[half:] & 0x0F).astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: uint8 [K//2, N] -> int8 [K, N] in [-8, 7]
    (halves layout: low nibbles are rows [0, K/2), high nibbles the rest)."""
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=0)


# ---------------------------------------------------------------------------
# Activation quantization (online, per token/row)
# ---------------------------------------------------------------------------

def quantize_act_per_token(
    x: jax.Array, bits: int = 8
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row absmax activation quant (mixlib.FindRowScale).

    x: [..., K] -> (q int8 [..., K], scale [..., 1] f32).
    For 4-bit activations values lie in [-8, 7] but are stored int8 (the MXU
    has no int4 lanes; packing only pays for weights at rest).
    """
    qmax = 127.0 if bits == 8 else 7.0
    import os as _os

    if _os.environ.get("MIXQ_ABLATE_QUANT", "0") == "1":
        # DIAGNOSTIC ONLY (per-op accounting, PROFILE_r04 §3.2): skip the
        # absmax/round passes (plain cast, unit scale) — keeps every int8
        # GEMM live at the same shapes; outputs are numerically wrong.
        return (x.astype(jnp.int8),
                jnp.ones((*x.shape[:-1], 1), jnp.float32))
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / qmax, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) absmax int8 quant for KV-cache writes.
    x: [..., hd] -> (int8 [..., hd], scale [...])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act_asymmetric(
    x: jax.Array, bits: int = 4
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Asymmetric per-row activation quant (QUIK path, qlinear.py:117-120).

    Returns (q int8 [..., K], scale [..., 1], zero [..., 1]) such that
    x ≈ (q + zero) * scale with q in [-2^(b-1), 2^(b-1)-1].
    """
    qlevels = 2.0 ** bits - 1.0
    xf = x.astype(jnp.float32)
    xmin = jnp.min(xf, axis=-1, keepdims=True)
    xmax = jnp.max(xf, axis=-1, keepdims=True)
    scale = jnp.maximum((xmax - xmin) / qlevels, 1e-8)
    lo = -(2.0 ** (bits - 1))
    zero = xmin / scale - lo                    # offset so that q+zero*... works
    q = jnp.clip(jnp.round(xf / scale - zero), lo, -lo - 1).astype(jnp.int8)
    return q, scale, zero


# ---------------------------------------------------------------------------
# Outlier machinery (static budget)
# ---------------------------------------------------------------------------

class OutlierSet(NamedTuple):
    """Static-budget outlier channel set for one linear layer.

    ind:    [B] int32  — channel indices into K, padded with 0 beyond count
    mask:   [B] f32    — 1.0 for live entries, 0.0 for padding
    k_mask: [K] f32    — 1.0 for inlier channels, 0.0 for outlier channels
    count:  [] int32   — number of live outliers
    """

    ind: jax.Array
    mask: jax.Array
    k_mask: jax.Array
    count: jax.Array

    @property
    def budget(self) -> int:
        return self.ind.shape[0]


def empty_outlier_set(k: int, budget: int) -> OutlierSet:
    return OutlierSet(
        ind=jnp.zeros((budget,), jnp.int32),
        mask=jnp.zeros((budget,), jnp.float32),
        k_mask=jnp.ones((k,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def outlier_set_from_indices(ind: jax.Array, k: int, budget: int) -> OutlierSet:
    """Build an OutlierSet from a concrete index list (e.g. top-B calib
    channels, mixquant.py:136: torch.sort(layer_scales)[1][-fp_features:])."""
    ind = jnp.asarray(ind, jnp.int32)
    n = ind.shape[0]
    assert n <= budget, f"{n} outliers exceed budget {budget}"
    padded = jnp.zeros((budget,), jnp.int32).at[:n].set(ind)
    mask = jnp.zeros((budget,), jnp.float32).at[:n].set(1.0)
    k_mask = jnp.ones((k,), jnp.float32).at[ind].set(0.0)
    return OutlierSet(padded, mask, k_mask, jnp.asarray(n, jnp.int32))


def detect_new_outliers(
    x: jax.Array, oset: OutlierSet, sigma: float
) -> OutlierSet:
    """Online outlier predictor update (reference linear.py:200-227).

    Finds channels where any |x| > sigma that are not already in the set and
    appends them up to the budget. Pure function: returns the new set. Static
    shapes throughout: uses a top-k over channel maxima rather than a dynamic
    nonzero. Intended to run during warmup (a handful of steps), host- or
    device-side; the steady-state forward never calls this.
    """
    k = x.shape[-1]
    ch_max = jnp.max(jnp.abs(x.astype(jnp.float32)).reshape(-1, k), axis=0)
    return detect_new_outliers_from_absmax(ch_max, oset, sigma)


def detect_new_outliers_from_absmax(
    ch_max: jax.Array, oset: OutlierSet, sigma: float
) -> OutlierSet:
    """Same as detect_new_outliers but from precomputed per-channel absmax
    (the statistic the decoder's collect_stats forward already emits)."""
    k = ch_max.shape[0]
    budget = oset.budget
    is_new = (ch_max > sigma) & (oset.k_mask > 0.5)          # [K]
    # rank new channels by magnitude; take up to the remaining budget
    score = jnp.where(is_new, ch_max, -jnp.inf)
    top_val, top_idx = jax.lax.top_k(score, budget)
    n_new = jnp.sum(is_new).astype(jnp.int32)
    space = budget - oset.count
    n_add = jnp.minimum(n_new, space)
    slots = jnp.arange(budget, dtype=jnp.int32)
    take = slots < n_add                                      # [B] live new entries
    # scatter new indices after existing ones
    dest = oset.count + slots                                 # desired positions
    dest = jnp.where(take, dest, budget)                      # drop → OOB (ignored)
    new_ind = oset.ind.at[dest].set(top_idx, mode="drop")
    new_mask = oset.mask.at[dest].set(1.0, mode="drop")
    upd_k = jnp.zeros((k,), jnp.float32).at[
        jnp.where(take, top_idx, k)
    ].set(1.0, mode="drop")
    new_k_mask = oset.k_mask * (1.0 - upd_k)
    return OutlierSet(new_ind, new_mask, new_k_mask, oset.count + n_add)


def extract_outliers(x: jax.Array, oset: OutlierSet) -> jax.Array:
    """Gather outlier channels of x into a dense [..., B] fp block and zero the
    padding (mixlib.ExtractOutliersAndSetToZeros, linear.py:189).

    The 'SetToZeros' half is done by multiplying x with oset.k_mask at the
    caller (dense mask multiply — TPU-friendlier than scatter)."""
    gathered = jnp.take(x, oset.ind, axis=-1)
    return gathered * oset.mask.astype(gathered.dtype)


def mask_inliers(x: jax.Array, oset: OutlierSet) -> jax.Array:
    """Zero the outlier channels of x (dense mask multiply)."""
    return x * oset.k_mask.astype(x.dtype)


def gather_outlier_weights(w: jax.Array, oset: OutlierSet) -> jax.Array:
    """Pull outlier *rows* of the [K, N] weight into a dense [B, N] fp block
    (the reference's weight_cache, linear.py:125-130 / promoted columns
    linear.py:205-219). Padded rows are zeroed so padded activations are
    harmless."""
    rows = jnp.take(w, oset.ind, axis=0)
    return rows * oset.mask[:, None].astype(rows.dtype)


def top_k_outliers_from_scales(
    act_scales: jax.Array, n: int, k: int, budget: int
) -> OutlierSet:
    """Calibration-time outlier pick: top-n channels by recorded activation
    absmax (reference mixquant.py:201-208 + linear.py:125)."""
    _, idx = jax.lax.top_k(act_scales.astype(jnp.float32), n)
    return outlier_set_from_indices(idx, k=k, budget=budget)


# ---------------------------------------------------------------------------
# Dequant epilogue helpers (jnp reference semantics for the Pallas kernels)
# ---------------------------------------------------------------------------

def dequant_epilogue(
    acc_i32: jax.Array,
    x_scale: jax.Array,
    w_scale: jax.Array,
    outlier_part: Optional[jax.Array] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """y = acc * x_scale * w_scale (+ outlier_part)  — mixlib.dequantizeInt8
    (linear.py:238-241) / int8FusedDequantize epilogue."""
    y = acc_i32.astype(jnp.float32) * x_scale * w_scale[None, :]
    if outlier_part is not None:
        y = y + outlier_part.astype(jnp.float32)
    return y.astype(out_dtype)


def reduced_weight_rowsum(q_w: jax.Array) -> jax.Array:
    """QUIK zero-point correction term: column-sum over K of the int weights
    (qlinear.py:195-198 'reduced_w'). q_w: [K, N] -> [N] f32."""
    return jnp.sum(q_w.astype(jnp.int32), axis=0).astype(jnp.float32)
