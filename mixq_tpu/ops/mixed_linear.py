"""Mixed-precision linear layers as pure functions over a param pytree.

TPU-native redesign of the reference's `MixLinear_GEMM`
(mixquant/modules/linear.py:26-377) and `MixedQLinear`
(mixquant/modules/qlinear.py:41-211). Instead of a mutable nn.Module with a
side-channel `MixLibCache`, a quantized linear here is:

    y = mixed_linear(params: MixLinearParams, x, spec: LinearSpec)

with all quantization state explicit in `params` and all precision policy
static in `spec`. The int GEMM runs on the MXU via `lax.dot_general`
(int8 x int8 -> int32); dequant epilogue, outlier fp GEMM and activation
fusion are jnp ops that XLA fuses, with Pallas kernels swapped in for the
fused hot path (mixq_tpu/ops/pallas/).

Reference kernel-contract coverage:
  - mixlib.gemm + dequantizeInt8[Silu]     -> int8_matmul + dequant_epilogue
  - mixlib.int8FusedDequantize[Silu]       -> mixed_linear (w_bit=8)
  - mixlib.int4FusedDequantize[Silu]       -> mixed_linear (w_bit=4)
  - EETQ.w8_a16_gemm                       -> mixed_linear (WEIGHT_ONLY)
  - quik.matmul.int{4,8}Matmul + dequant   -> mixed_linear (QUIK)
  - torch.mm(outlier_act, weight_cache.T)  -> outlier fp GEMM term
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mixq_tpu.ops import quant as Q


@dataclasses.dataclass(frozen=True)
class LinearSpec:
    """Static per-layer precision policy (hashable; safe as a jit static)."""

    w_bit: int = 8              # 4 | 8 | 16
    a_bit: int = 8              # 4 | 8 | 16
    version: str = "MIX"        # "MIX" | "QUIK" | "WEIGHT_ONLY" | "FP16"
    outlier_budget: int = 128
    fuse: str = "none"          # "none" | "silu" | "gelu" | "gelu_new"
    out_dtype: str = "bfloat16"
    group_size: int = -1        # >0: per-(K-group, out-channel) weight scales
                                # (reference q_group_size); -1 = per-channel

    @property
    def odtype(self):
        return jnp.dtype(self.out_dtype)


class MixLinearParams(NamedTuple):
    """Quantized linear parameters. Weight layout is [K, N] (in-dim first) so
    the forward contraction is x[M,K] @ w[K,N] with no transpose.

    q_weight:  int8 [K, N]           (w_bit 8 or 4-unpacked)
               uint8 [K//2, N]       (w_bit 4 packed)  — see packed flag in spec
               bf16  [K, N]          (FP16 spec)
    w_scale:   f32 [N]               per-out-channel scale
    w_outlier: bf16 [B, N] | None    fp weights for outlier channels (rows
                                     gathered from the fp weight; padded rows 0)
    out_ind:   int32 [B]  | None     outlier channel indices (padded)
    out_mask:  f32 [B]    | None     1 for live outlier slots
    k_mask:    f32 [K]    | None     1 for inlier channels (dense zeroing mask)
    out_count: int32 []   | None
    bias:      bf16 [N]   | None
    reduced_w: f32 [N]    | None     QUIK zero-point correction (col-sum of q_w)
    """

    q_weight: jax.Array
    w_scale: jax.Array
    w_outlier: Optional[jax.Array] = None
    out_ind: Optional[jax.Array] = None
    out_mask: Optional[jax.Array] = None
    k_mask: Optional[jax.Array] = None
    out_count: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    reduced_w: Optional[jax.Array] = None

    @property
    def outlier_set(self) -> Optional[Q.OutlierSet]:
        if self.out_ind is None:
            return None
        return Q.OutlierSet(self.out_ind, self.out_mask, self.k_mask, self.out_count)


class QuantizedAct(NamedTuple):
    """Pre-quantized activation bundle — the functional replacement for the
    reference's mutable MixLibCache fields (q_xcache, x_scale,
    activation_outliers; Cache.py:5-40). Produced once (e.g. by the fused
    RMSNorm+quant op) and consumed by every linear sharing that input."""

    q_x: jax.Array              # int8 [..., K] (inlier channels, outliers zeroed)
    x_scale: jax.Array          # f32 [..., 1]
    x_outlier: Optional[jax.Array]  # [..., B] fp outlier activations (or None)


# ---------------------------------------------------------------------------
# Weight-materialization helpers
# ---------------------------------------------------------------------------

def int_weight(params: MixLinearParams, spec: LinearSpec) -> jax.Array:
    """Return the int8 [K, N] weight view.

    int4 weights are stored as jnp.int4 (XLA-native; packed in HBM on TPU,
    with the widening convert fused into the consumer) — the cast here is
    the in-kernel unpack of the reference's mixlib int4 path. Legacy
    uint8-packed storage (2 nibbles/byte) is also accepted."""
    qw = params.q_weight
    if qw.dtype == jnp.int4:
        return qw.astype(jnp.int8)
    if spec.w_bit == 4 and qw.dtype == jnp.uint8:
        return Q.unpack_int4(qw)
    return qw


def _apply_fuse(y: jax.Array, fuse: str, out_dtype) -> jax.Array:
    if fuse == "silu":
        y = jax.nn.silu(y.astype(jnp.float32))
    elif fuse == "gelu":
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False)
    elif fuse == "gelu_new":
        # HF NewGELUActivation == tanh-approximate GELU (gptj, gpt2-family)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=True)
    return y.astype(out_dtype)


def int8_matmul(q_x: jax.Array, q_w: jax.Array) -> jax.Array:
    """int8 x int8 -> int32 contraction on the MXU (mixlib.gemm /
    quik.matmul.int8Matmul). q_x: [..., K], q_w: [K, N]."""
    return jax.lax.dot_general(
        q_x, q_w,
        dimension_numbers=(((q_x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


# ---------------------------------------------------------------------------
# Activation preparation (the "precondition" half of the reference forward)
# ---------------------------------------------------------------------------

def prepare_act(
    x: jax.Array, params: MixLinearParams, spec: LinearSpec
) -> QuantizedAct:
    """Quantize an fp activation for a mixed linear: extract outlier channels,
    zero them, per-token scale+cast. This is the reference's `unfused`
    precondition path (linear.py:187-195: ExtractOutliersAndSetToZeros +
    FindRowScale), used by o_proj/down_proj on fresh activations."""
    oset = params.outlier_set
    if oset is not None:
        x_out = Q.extract_outliers(x, oset)
        x_in = Q.mask_inliers(x, oset)
    else:
        x_out, x_in = None, x
    q_x, x_scale = Q.quantize_act_per_token(x_in, bits=min(spec.a_bit, 8))
    return QuantizedAct(q_x, x_scale, x_out)


def prepare_act_from_heads(
    x4: jax.Array, params: MixLinearParams, spec: LinearSpec
) -> QuantizedAct:
    """prepare_act for the attention output BEFORE its [B, T, h, d] ->
    [B, T, N] flatten: absmax + quantize run in the attend's own
    (head, d) tile domain, so the layout copy to the o_proj GEMM's
    operand tiling moves the INT8 result (2MB at the B=512 headline)
    instead of the f32 activation (8MB) — one of the per-layer glue
    copies of PROFILE_r04 §3.3. Numerically identical to
    prepare_act(x4.reshape(..., N)): the token absmax is over all h*d
    channels either way, and the elementwise quantize commutes with the
    reshape. Gated by MIXQ_WO_QUANT_4D until measured in-model."""
    B, T, h, d = x4.shape
    N = h * d
    oset = params.outlier_set
    if oset is not None:
        # flat channel index n = h_i * d + d_i; gather the few outlier
        # columns through a flat VIEW (reads only `budget` columns) and
        # mask inliers elementwise in the 4d domain
        x_out = jnp.take(x4.reshape(B, T, N), oset.ind, axis=-1)
        x_out = x_out * oset.mask.astype(x_out.dtype)
        x_in = x4 * oset.k_mask.reshape(h, d).astype(x4.dtype)
    else:
        x_out, x_in = None, x4
    qmax = 127.0 if min(spec.a_bit, 8) == 8 else 7.0
    absmax = jnp.max(jnp.abs(x_in.astype(jnp.float32)), axis=(-2, -1))
    x_scale = jnp.maximum(absmax / qmax, 1e-8)[..., None, None]
    q4 = jnp.clip(jnp.round(x_in.astype(jnp.float32) / x_scale),
                  -qmax, qmax).astype(jnp.int8)
    return QuantizedAct(q4.reshape(B, T, N), x_scale[..., 0, 0][..., None],
                        x_out)


# ---------------------------------------------------------------------------
# Forward paths
# ---------------------------------------------------------------------------

def mixed_linear_prepared(
    params: MixLinearParams, act: QuantizedAct, spec: LinearSpec
) -> jax.Array:
    """Mixed int GEMM on a pre-quantized activation (the reference's
    `forward_without_precondition[FusedSilu]`, linear.py:292-376)."""
    if (params.q_weight.dtype == jnp.uint8 and spec.w_bit == 4
            and jax.default_backend() == "tpu"):
        # packed-W4 hot path: the Pallas kernel unpacks nibbles in its
        # prologue so the HBM weight read is HALF of W8's — the int4
        # bandwidth win the XLA path forfeits (unpack materializes a
        # [K, N] int8 copy, and the relay cannot move jnp.int4 buffers).
        # mixlib.int4FusedDequantize[Silu] equivalent (linear.py:259).
        # Grouped [G, N] scales ride the same kernel through its
        # G-batched int8 MXU dot (mix_gemm._grouped_int8_dot — the
        # activation is pre-shaped [G, M, gs] outside the kernel and the
        # unpacked weight block reshapes [G, gs, bn]); the bf16
        # weight-dequant prologue is only the W4A16 weight-only mode
        # (int8 activations never pay its measured 27% VPU cost).
        from mixq_tpu.ops.pallas.mix_gemm import mix_gemm

        lead = act.q_x.shape[:-1]
        K = act.q_x.shape[-1]
        fuse_in_kernel = spec.fuse if params.bias is None else "none"
        y = mix_gemm(
            act.q_x.reshape(-1, K), params.q_weight,
            act.x_scale.reshape(-1, 1), params.w_scale,
            (act.x_outlier.reshape(-1, act.x_outlier.shape[-1])
             if act.x_outlier is not None and params.w_outlier is not None
             else None),
            params.w_outlier,
            fuse=fuse_in_kernel, out_dtype=spec.odtype,
        ).reshape(*lead, params.q_weight.shape[1])
        if params.bias is not None:
            y = y.astype(jnp.float32) + params.bias.astype(jnp.float32)
            y = _apply_fuse(y, spec.fuse, spec.odtype)
        return y
    if (_GEMM_IMPL == "pallas" and params.q_weight.dtype == jnp.int8
            and params.w_scale.ndim == 1
            and jax.default_backend() == "tpu"):
        # MIXQ_GEMM=pallas: route W8A8 through the unified mix_gemm kernel
        # (GEMM + dequant + outlier-add + activation in one VMEM-resident
        # program — mixlib.int8FusedDequantize[Silu], linear.py:251,283).
        # Isolated-op relay microbenches are unusably noisy (CLAUDE.md);
        # this knob exists so bench.py can difference the TWO FULL-MODEL
        # throughputs — the only trustworthy pallas-vs-XLA GEMM evidence
        # on this stack.
        from mixq_tpu.ops.pallas.mix_gemm import mix_gemm

        lead = act.q_x.shape[:-1]
        K = act.q_x.shape[-1]
        fuse_in_kernel = spec.fuse if params.bias is None else "none"
        y = mix_gemm(
            act.q_x.reshape(-1, K), params.q_weight,
            act.x_scale.reshape(-1, 1), params.w_scale,
            (act.x_outlier.reshape(-1, act.x_outlier.shape[-1])
             if act.x_outlier is not None and params.w_outlier is not None
             else None),
            params.w_outlier,
            fuse=fuse_in_kernel, out_dtype=spec.odtype,
        ).reshape(*lead, params.q_weight.shape[1])
        if params.bias is not None:
            y = y.astype(jnp.float32) + params.bias.astype(jnp.float32)
            y = _apply_fuse(y, spec.fuse, spec.odtype)
        return y
    q_w = int_weight(params, spec)
    outlier_part = None
    if act.x_outlier is not None and params.w_outlier is not None:
        outlier_part = jnp.dot(
            act.x_outlier.astype(jnp.float32),
            params.w_outlier.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    if params.w_scale.ndim == 2:   # group-quantized weights [G, N]
        lead = act.q_x.shape[:-1]
        y = Q.grouped_int8_matmul_dequant(
            act.q_x.reshape(-1, act.q_x.shape[-1]),
            act.x_scale.reshape(-1, 1), q_w, params.w_scale,
        ).reshape(*lead, q_w.shape[1])
        if outlier_part is not None:
            y = y + outlier_part
    else:
        acc = int8_matmul(act.q_x, q_w)
        y = Q.dequant_epilogue(
            acc, act.x_scale, params.w_scale, outlier_part, jnp.float32
        )
    if params.bias is not None:
        y = y + params.bias.astype(jnp.float32)
    return _apply_fuse(y, spec.fuse, spec.odtype)


def mixed_linear(
    params: MixLinearParams, x: jax.Array, spec: LinearSpec
) -> jax.Array:
    """Full mixed-precision linear on an fp activation.

    Dispatches on spec.version/w_bit, covering all three reference modes of
    MixLinear_GEMM.forward (linear.py:165-289) plus the QUIK MixedQLinear."""
    if spec.version == "FP16" or spec.w_bit == 16:
        y = jnp.dot(x, params.q_weight.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        if params.bias is not None:
            y = y + params.bias.astype(jnp.float32)
        return _apply_fuse(y, spec.fuse, spec.odtype)

    if spec.version == "WEIGHT_ONLY":
        return w8a16_linear(params, x, spec)

    if spec.version == "QUIK":
        return quik_linear(params, x, spec)

    act = prepare_act(x, params, spec)
    return mixed_linear_prepared(params, act, spec)


def w8a16_linear(
    params: MixLinearParams, x: jax.Array, spec: LinearSpec
) -> jax.Array:
    """Weight-only W8A16 (EETQ.w8_a16_gemm, linear.py:178-184): weights stay
    int8 in HBM (memory win), dequantized on the fly into the matmul. XLA
    fuses the dequant into the GEMM prologue; a Pallas kernel covers the
    bandwidth-bound decode case."""
    w = params.q_weight.astype(jnp.bfloat16) * params.w_scale.astype(
        jnp.bfloat16
    )[None, :]
    y = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    if params.bias is not None:
        y = y + params.bias.astype(jnp.float32)
    return _apply_fuse(y, spec.fuse, spec.odtype)


def quik_linear(
    params: MixLinearParams, x: jax.Array, spec: LinearSpec
) -> jax.Array:
    """QUIK-style static-split linear (qlinear.py:80-153): fixed fp outlier
    columns from calibration, asymmetric per-row activation quant with
    zero-point correction via reduced_w (col-sum of int weights)."""
    oset = params.outlier_set
    if oset is not None:
        x_out = Q.extract_outliers(x, oset)
        x_in = Q.mask_inliers(x, oset)
    else:
        x_out, x_in = None, x
    q_x, x_scale, x_zero = Q.quantize_act_asymmetric(x_in, bits=min(spec.a_bit, 8))
    q_w = int_weight(params, spec)
    acc = int8_matmul(q_x, q_w).astype(jnp.float32)
    # x ≈ (q + zero)*s_x, w ≈ q_w*s_w  =>  x@w ≈ s_x*s_w*(acc + zero*colsum(q_w))
    corr = x_zero * params.reduced_w[None, :]
    y = x_scale * params.w_scale[None, :] * (acc + corr)
    if x_out is not None and params.w_outlier is not None:
        y = y + jnp.dot(
            x_out.astype(jnp.float32), params.w_outlier.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    if params.bias is not None:
        y = y + params.bias.astype(jnp.float32)
    return _apply_fuse(y, spec.fuse, spec.odtype)


# ---------------------------------------------------------------------------
# Parameter construction (offline quantization of one linear)
# ---------------------------------------------------------------------------

import os as _os

# int4 at-rest storage. DEFAULT: packed uint8 (2/byte, halves layout),
# consumed by the Pallas mix_gemm kernel's unpack prologue on TPU and
# bit-exactly unpacked by int_weight() elsewhere. This is the measured
# rule (PROFILE_r03 §4/§9): packed W4 wins +12.2% over widened at B=32
# (weight-bandwidth-bound) and is a wash at B=512 (compute-bound), and
# grouped [G, N] scales run at per-channel speed through the same kernel
# — the blocker that had kept this off is closed. uint8 also transfers
# fine through the relay, which cannot move jnp.int4 buffers.
# MIXQ_W4_PACKED=0 falls back to jnp.int4 native storage (XLA packs it
# in HBM; MIXQ_INT4_NATIVE=0 further widens to int8 — no bandwidth win).
_INT4_NATIVE = _os.environ.get("MIXQ_INT4_NATIVE", "1") == "1"
_W4_PACKED = _os.environ.get("MIXQ_W4_PACKED", "1") == "1"
# MIXQ_GEMM=pallas routes W8A8 mixed linears through ops/pallas/mix_gemm
# instead of XLA's int8 dot_general — a full-model A/B knob for bench.py
# (default xla: measured faster in-model, see PROFILE_r03.md)
_GEMM_IMPL = _os.environ.get("MIXQ_GEMM", "xla")


def _default_w4_pack():
    if _W4_PACKED:
        return "packed"
    return _INT4_NATIVE


def _store_w4(q_w: jax.Array, pack) -> jax.Array:
    """Apply the chosen int4 at-rest storage to an int8-valued [-8,7] weight:
    True -> jnp.int4, "packed" -> uint8 2/byte (halves), False -> int8."""
    if pack == "packed":
        return Q.pack_int4(q_w)
    if pack:
        return q_w.astype(jnp.int4)
    return q_w


def from_float(
    w: jax.Array,
    spec: LinearSpec,
    bias: Optional[jax.Array] = None,
    outlier_set: Optional[Q.OutlierSet] = None,
    pack: Optional[bool] = None,
    store_dtype=jnp.bfloat16,
) -> MixLinearParams:
    """Quantize an fp weight [K, N] into MixLinearParams
    (MixLinear_GEMM.from_linear, linear.py:89-150 / MixedQLinear.from_linear,
    qlinear.py:155-211). Outlier channels (if any) keep an fp copy in
    w_outlier; their int columns are zeroed so the int GEMM contribution
    vanishes even without activation masking."""
    w = jnp.asarray(w)
    K, N = w.shape
    if spec.version == "FP16" or spec.w_bit == 16:
        return MixLinearParams(
            q_weight=w.astype(store_dtype),
            w_scale=jnp.ones((N,), jnp.float32),
            bias=None if bias is None else jnp.asarray(bias, store_dtype),
        )

    w_outlier = None
    oset_fields = (None, None, None, None)
    w_for_quant = w
    if outlier_set is not None and spec.version != "WEIGHT_ONLY":
        w_outlier = Q.gather_outlier_weights(w, outlier_set).astype(store_dtype)
        # zero outlier rows in the int weight (keeps int GEMM exact even if
        # the activation outlier channels are not zeroed, and improves the
        # inlier scale since outlier weight rows can be large)
        w_for_quant = w * outlier_set.k_mask[:, None].astype(w.dtype)
        oset_fields = tuple(outlier_set)

    if spec.group_size > 0 and spec.w_bit <= 8:
        q_w, w_scale = Q.quantize_weight_grouped(
            w_for_quant, bits=spec.w_bit, group_size=spec.group_size)
        if spec.w_bit == 4:
            if pack is None:
                pack = _default_w4_pack()
            # packed storage works with grouped scales too: mix_gemm folds
            # the [G, N] scales into its unpack prologue (bf16-dot path)
            q_w = _store_w4(q_w, pack)
    elif spec.w_bit == 8:
        q_w, w_scale = Q.quantize_weight_int8(w_for_quant)
    elif spec.w_bit == 4:
        q_w, w_scale = Q.quantize_weight_int4(w_for_quant)
        if pack is None:
            pack = _default_w4_pack()
        q_w = _store_w4(q_w, pack)
    else:
        raise ValueError(f"unsupported w_bit {spec.w_bit}")

    reduced_w = None
    if spec.version == "QUIK":
        # column sums need the int VALUES — unpack packed-uint8 storage
        # first (a raw astype would sum packed bytes)
        q_vals = (Q.unpack_int4(q_w) if q_w.dtype == jnp.uint8
                  else q_w.astype(jnp.int8))
        reduced_w = Q.reduced_weight_rowsum(q_vals)

    return MixLinearParams(
        q_weight=q_w,
        w_scale=w_scale,
        w_outlier=w_outlier,
        out_ind=oset_fields[0],
        out_mask=oset_fields[1],
        k_mask=oset_fields[2],
        out_count=oset_fields[3],
        bias=None if bias is None else jnp.asarray(bias, store_dtype),
        reduced_w=reduced_w,
    )


def promote_outliers(
    params: MixLinearParams,
    w_fp: Optional[jax.Array],
    new_oset: Q.OutlierSet,
    spec: LinearSpec,
) -> MixLinearParams:
    """Online outlier promotion (reference linear.py:200-227): given an
    updated outlier set, rebuild w_outlier (from the fp weight if available,
    else dequantized int weight — matching `q_weight[:,ind]*scale_col` /
    `unpack_int4_to_fp16`, linear.py:205-219) and zero those rows in the int
    weight. Runs outside the steady-state jit, during warmup."""
    if w_fp is None:
        q_w = int_weight(params, spec).astype(jnp.float32)
        w_fp = q_w * params.w_scale[None, :]
    w_outlier = Q.gather_outlier_weights(w_fp, new_oset).astype(jnp.bfloat16)
    q_w_int = int_weight(params, spec)
    q_w_int = (
        q_w_int.astype(jnp.float32) * new_oset.k_mask[:, None]
    ).astype(jnp.int8)
    if params.q_weight.dtype == jnp.int4:
        q_w_store = q_w_int.astype(jnp.int4)
    elif spec.w_bit == 4 and params.q_weight.dtype == jnp.uint8:
        q_w_store = Q.pack_int4(q_w_int)
    else:
        q_w_store = q_w_int
    return params._replace(
        q_weight=q_w_store,
        w_outlier=w_outlier,
        out_ind=new_oset.ind,
        out_mask=new_oset.mask,
        k_mask=new_oset.k_mask,
        out_count=new_oset.count,
    )
