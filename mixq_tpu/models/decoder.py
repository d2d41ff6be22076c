"""Generic functional decoder-only transformer over a quantized param pytree.

This is the TPU-native replacement for the reference's module-surgery stack
(models/base.py:273-404 swapping nn.Linear for MixLinear_GEMM + per-model
*Fuser classes, models/llama.py:73-178): here a model IS a param pytree plus
a pure `forward` function; quantization is a property of the params, and the
per-linear precision policy is a static `DecoderSpecs`.

One decoder covers the reference's model families via ModelConfig switches:
  llama/llama-2/llama-3/aquila   : RMSNorm, SwiGLU, GQA, neox rope
                                   (+ llama3/linear rope_scaling)
  qwen2                          : + attention qkv bias
  qwen3                          : + per-head QK-Norm before RoPE
  mistral                        : + sliding window (ring KV reclaim)
  baichuan                       : fused W_pack qkv; 13B selects ALiBi
  falcon                         : LayerNorm, GELU no-gate MLP, parallel attn+mlp, MQA
  gptj                           : LayerNorm, parallel block, gptj rope, partial rotary
  opt                            : LayerNorm, GELU MLP, learned positions (adapter maps
                                   learned pos-emb into embed at load time)
  gemma / gemma2                 : sqrt(H) embed scale, GeGLU, (1+w) norms;
                                   gemma2 adds post-norms, softcaps,
                                   query_pre_attn_scalar, alternating windows
  mixtral / qwen2_moe            : sparse-MoE MLP (ops/moe.py; qwen2_moe
                                   adds the sigmoid-gated shared expert)
  phi3                           : packed qkv/gate_up, longrope scaling
  chatglm                        : packed gate|up, gptj-style partial rotary
"""
from __future__ import annotations

import dataclasses
import os as _os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mixq_tpu.config import ModelConfig
from mixq_tpu.models.layers import (
    KVCache, apply_rope, attend, layernorm, rmsnorm, rope_cos_sin,
)
from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import (
    LinearSpec, MixLinearParams, QuantizedAct, from_float, mixed_linear,
    mixed_linear_prepared, prepare_act,
)


class AttnParams(NamedTuple):
    """q/k/v kept as separate tensors sharing ONE quantized activation.

    The reference fuses them into a single W_pack GEMM (llama.py:98-166) to
    amortize CUDA kernel launches; on TPU there is no launch overhead and a
    fused N dim breaks head-aligned tensor-parallel sharding, so the
    TPU-native form is three GEMMs over one shared int8 activation — same
    HBM traffic for activations, clean P(None,'model') shards per tensor.
    """

    wq: MixLinearParams            # [H, nq*hd]
    wk: MixLinearParams            # [H, nkv*hd]
    wv: MixLinearParams            # [H, nkv*hd]
    wo: MixLinearParams            # [nq*hd, H]
    # QK-Norm (qwen3): per-head RMSNorm scales [hd] applied before RoPE
    q_norm: Optional[jax.Array] = None
    k_norm: Optional[jax.Array] = None


class MLPParams(NamedTuple):
    up: Optional[MixLinearParams]  # [H, I]  (fc_in for no-gate archs);
                                   # None for sparse-MoE blocks
    gate: Optional[MixLinearParams]  # [H, I] or None (falcon/gptj/opt)
    down: Optional[MixLinearParams]  # [I, H]  (fc_out)
    # sparse mixture-of-experts MLP (mixtral) — replaces up/gate/down
    moe: Optional["object"] = None  # ops.moe.MoEParams


class BlockParams(NamedTuple):
    ln1_scale: jax.Array
    ln1_bias: Optional[jax.Array]
    attn: AttnParams
    ln2_scale: Optional[jax.Array]  # None for parallel-block archs
    ln2_bias: Optional[jax.Array]
    mlp: MLPParams
    # gemma2 post-norms: applied to the attn/mlp OUTPUT before its
    # residual add (HF post_attention_layernorm has PRE-residual semantics
    # there, unlike llama's pre-MLP one)
    post_attn_norm_scale: Optional[jax.Array] = None
    post_ffw_norm_scale: Optional[jax.Array] = None


class DecoderParams(NamedTuple):
    embed: jax.Array               # [V, H]
    blocks: Tuple[BlockParams, ...]
    lnf_scale: jax.Array
    lnf_bias: Optional[jax.Array]
    lm_head: Optional[jax.Array]   # [H, V] fp; None = tied to embed
    # runtime-only: blocks stacked with a leading layer axis, consumed by a
    # lax.scan over layers (one compiled block body instead of L inlined
    # copies — 32x smaller XLA graph for Llama-2-7B). Built via
    # stack_decoder_params(); mutually exclusive with `blocks`.
    stacked: Optional[BlockParams] = None
    # learned positional embeddings [P, H] (OPT family; None = rotary-only)
    pos_embed: Optional[jax.Array] = None


def stack_decoder_params(params: DecoderParams) -> DecoderParams:
    """Stack the per-layer block pytrees along a new leading axis for the
    scan-based forward. Requires structurally uniform blocks (same spec per
    layer — true for every model family here)."""
    if params.stacked is not None:
        return params
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params.blocks)
    return params._replace(blocks=(), stacked=stacked)


def unstack_decoder_params(params: DecoderParams) -> DecoderParams:
    """Inverse of stack_decoder_params (for promotion/checkpointing)."""
    if params.stacked is None:
        return params
    L = jax.tree_util.tree_leaves(params.stacked)[0].shape[0]
    blocks = tuple(
        jax.tree.map(lambda x: x[i], params.stacked) for i in range(L))
    return params._replace(blocks=blocks, stacked=None)


@dataclasses.dataclass(frozen=True)
class DecoderSpecs:
    """Static per-linear precision policy, uniform across layers (the
    reference's weight_only_map / eightbit_only_name policy tables,
    utils/module.py:2-12, resolved at quantization time)."""

    wqkv: LinearSpec = LinearSpec(version="FP16", w_bit=16)
    wo: LinearSpec = LinearSpec(version="FP16", w_bit=16)
    up: LinearSpec = LinearSpec(version="FP16", w_bit=16)
    gate: LinearSpec = LinearSpec(version="FP16", w_bit=16)
    down: LinearSpec = LinearSpec(version="FP16", w_bit=16)
    # decode attention implementation:
    #   "xla"      einsum with bf16 operands (default)
    #   "flash"    MXU flash-decode Pallas kernel over a HEAD-MAJOR cache
    #              (ops/pallas/flash_decode.py) — callers must create the
    #              KVCache with head_major=True; int8 cache consumed
    #              natively by the MXU (no per-element widening)
    #   "xla_int8" both attention contractions int8 x int8 (q and probs
    #              absmax-quantized; requires int8 KV) — no K/V widening
    #   "auto"     (default) "flash" on TPU when the kernel supports the
    #              model/shapes (ops/pallas/flash_decode.use_head_major_cache),
    #              "xla" otherwise
    attn_impl: str = "auto"

    @classmethod
    def uniform(cls, spec: LinearSpec) -> "DecoderSpecs":
        gate = dataclasses.replace(spec, fuse="silu")
        return cls(wqkv=spec, wo=spec, up=spec, gate=gate, down=spec)

    @classmethod
    def fp16(cls) -> "DecoderSpecs":
        s = LinearSpec(version="FP16", w_bit=16)
        return cls.uniform(s)


def _norm(x, scale, bias, cfg: ModelConfig):
    if cfg.layernorm == "rmsnorm":
        return rmsnorm(x, scale, cfg.rms_norm_eps)
    return layernorm(x, scale, bias, cfg.rms_norm_eps)


def _absmax_channels(x: jax.Array) -> jax.Array:
    """Per-channel absolute max over batch/time — the calibration statistic
    (reference smooth_quant_get_act.py:13-51 records the same via hooks)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)).reshape(-1, x.shape[-1]), axis=0)


def _mlp(h: jax.Array, mlp: MLPParams, specs: DecoderSpecs, cfg: ModelConfig):
    """SwiGLU (MixLlamaMLP, fused/mlp.py:37-70) or plain act MLP
    (MixFalconMLP/MixGPTJMLP, fused/mlp.py:8-33,74-94). The up/gate pair
    shares one quantized activation — the functional equivalent of the
    reference's cache.q_xcache reuse between up_proj and gate_proj."""
    if mlp.moe is not None:
        from mixq_tpu.ops.moe import moe_mlp

        out = moe_mlp(h, mlp.moe, specs.up, specs.down,
                      top_k=cfg.num_experts_per_tok,
                      capacity_factor=cfg.moe_capacity_factor,
                      act="silu" if cfg.hidden_act == "silu" else "gelu",
                      norm_topk=cfg.moe_norm_topk)
        # second value feeds calibration stats ("down" input); MoE experts
        # skip the outlier machinery (ops/moe.py docstring), so report the
        # MLP input
        return out, h
    if mlp.gate is not None:
        # gated-MLP activation follows the config: SwiGLU (llama family)
        # or GeGLU (gemma's gelu_pytorch_tanh == tanh-approx gelu)
        gate_fuse = {"gelu": "gelu", "gelu_new": "gelu_new",
                     "gelu_pytorch_tanh": "gelu_new"}.get(
                         cfg.hidden_act, "silu")
        spec_gate = (specs.gate if specs.gate.fuse == gate_fuse
                     else dataclasses.replace(specs.gate, fuse=gate_fuse))
        if specs.up.version in ("FP16", "WEIGHT_ONLY", "QUIK"):
            up = mixed_linear(mlp.up, h, specs.up)
            gate = mixed_linear(mlp.gate, h, spec_gate)      # fused act
        else:
            act = prepare_act(h, mlp.up, specs.up)
            up = mixed_linear_prepared(mlp.up, act, specs.up)
            gate = mixed_linear_prepared(mlp.gate, act, spec_gate)
        inner = (gate.astype(jnp.float32) * up.astype(jnp.float32)).astype(up.dtype)
    else:
        spec_up = specs.up
        if spec_up.fuse == "none" and cfg.hidden_act not in ("relu",):
            act = ("gelu_new"
                   if cfg.hidden_act in ("gelu_new", "gelu_pytorch_tanh")
                   else "gelu")
            spec_up = dataclasses.replace(spec_up, fuse=act)
        inner = mixed_linear(mlp.up, h, spec_up)
        if cfg.hidden_act == "relu":
            inner = jnp.maximum(inner, 0)
    return mixed_linear(mlp.down, inner, specs.down), inner


def block_core(
    x: jax.Array,                  # [B, T, H]
    bp: BlockParams,
    kv_apply,                      # (q[B,T,nq,hd], k, v) -> attn out [B,T,nq,hd]
                                   # — strategy closure that writes k/v into
                                   # the cache and runs attention over it
    cos: jax.Array,
    sin: jax.Array,
    specs: DecoderSpecs,
    cfg: ModelConfig,
    collect_stats: bool = False,
):
    """One decoder block, KV-cache strategy injected. The python-loop runtime
    updates the full [L, ...] cache arrays in place (XLA donation keeps this
    copy-free); the lax.scan path works on per-layer slices."""
    B, T, H = x.shape
    n_q, n_kv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    h_ln = _norm(x, bp.ln1_scale, bp.ln1_bias, cfg)

    # --- attention (QuantAttentionFused, fused/attn.py:206-278) ---
    # one shared quantized activation feeds all three projections (the
    # reference's W_pack fusion / SharedQuantizedInput, qlinear.py:22-38)
    if specs.wqkv.version in ("FP16", "WEIGHT_ONLY", "QUIK"):
        q = mixed_linear(bp.attn.wq, h_ln, specs.wqkv)
        k = mixed_linear(bp.attn.wk, h_ln, specs.wqkv)
        v = mixed_linear(bp.attn.wv, h_ln, specs.wqkv)
    else:
        act = prepare_act(h_ln, bp.attn.wq, specs.wqkv)
        q = mixed_linear_prepared(bp.attn.wq, act, specs.wqkv)
        k = mixed_linear_prepared(bp.attn.wk, act, specs.wqkv)
        v = mixed_linear_prepared(bp.attn.wv, act, specs.wqkv)
    v = v.reshape(B, T, n_kv, hd)
    # Flat rope (apply_rope_flat): rotate on the GEMM's own [B, T, n*hd]
    # layout so XLA doesn't relayout q/k into a rope-only tile domain and
    # back (2 copies x 8MB per projection per layer at B=512 — the
    # biggest slice of PROFILE_r04 §3.3's glue). Falls back to the
    # per-head path for partial-rotary / gptj-interleave / QK-norm
    # models. Bit-identical to the per-head path in f32.
    # MEASURED AND REJECTED as default (BENCH_AB_r05): 13,359 vs 13,724
    # tok/s at the B=512 headline — the in-tile lane rotation costs more
    # VPU time than the two relayout copies it removes, and bf16 rope
    # compounds the loss (12,745). Default OFF; knob kept for the census
    # evidence (PROFILE_r05 §1).
    flat_rope = (
        _os.environ.get("MIXQ_ROPE_FLAT", "0") == "1"
        and cfg.rope_style == "neox"
        and (cfg.rotary_dim is None or cfg.rotary_dim == hd)
        and bp.attn.q_norm is None
    )
    if flat_rope:
        from mixq_tpu.models.layers import apply_rope_flat

        # MIXQ_ROPE_COMPUTE=bfloat16: rotate in bf16 so the GEMM
        # epilogue's bf16 output survives into the rope fusion (the
        # default f32 rope re-upcasts, and XLA's excess-precision pass
        # then elides the epilogue's bf16 round — every q/k layout copy
        # moves f32 bytes instead of bf16). Numerics priced by the PPL
        # gate before any default flip.
        rope_cd = (jnp.bfloat16
                   if _os.environ.get("MIXQ_ROPE_COMPUTE", "f32")
                   == "bfloat16" else jnp.float32)
        q = apply_rope_flat(q, cos, sin, hd,
                            compute_dtype=rope_cd).reshape(B, T, n_q, hd)
        k = apply_rope_flat(k, cos, sin, hd,
                            compute_dtype=rope_cd).reshape(B, T, n_kv, hd)
    else:
        q = q.reshape(B, T, n_q, hd)
        k = k.reshape(B, T, n_kv, hd)
        if bp.attn.q_norm is not None:
            # QK-Norm (qwen3): per-head RMSNorm over head_dim before RoPE
            from mixq_tpu.models.layers import rmsnorm

            q = rmsnorm(q, bp.attn.q_norm, eps=cfg.rms_norm_eps)
            k = rmsnorm(k, bp.attn.k_norm, eps=cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin, cfg.rope_style, cfg.rotary_dim)
        k = apply_rope(k, cos, sin, cfg.rope_style, cfg.rotary_dim)

    if _os.environ.get("MIXQ_ABLATE_ATTN", "0") == "1" and n_q == n_kv:
        # DIAGNOSTIC ONLY (per-op accounting, PROFILE_r04): replace the
        # whole attention stage (cache write + attend) with a cheap
        # combine, leaving every GEMM live. The full-model A/B difference
        # against the real step is attention's true in-model cost — the
        # only per-op instrument that works through the relay (isolated
        # chains read 0.0ms; CLAUDE.md).
        attn4 = q + 0.0009765625 * (k + v)
    else:
        attn4 = kv_apply(q, k, v)
    # o_proj quantizes its own input inline (the reference's unfused=True
    # call, attn.py:263 -> linear.py:187-195). MIXQ_WO_QUANT_4D=1:
    # quantize BEFORE the [B,T,h,d]->[B,T,N] flatten so the layout copy
    # into the GEMM's operand tiling moves int8, not f32 (glue attack,
    # PROFILE_r04 §3.3) — bit-identical either way.
    if (_os.environ.get("MIXQ_WO_QUANT_4D", "0") == "1"
            and specs.wo.version == "MIX" and specs.wo.w_bit < 16):
        from mixq_tpu.ops.mixed_linear import prepare_act_from_heads

        act_wo = prepare_act_from_heads(attn4, bp.attn.wo, specs.wo)
        attn_raw = (attn4.reshape(B, T, n_q * hd) if collect_stats
                    else None)
        attn_out = mixed_linear_prepared(bp.attn.wo, act_wo, specs.wo)
    else:
        attn_raw = attn4.reshape(B, T, n_q * hd)
        attn_out = mixed_linear(bp.attn.wo, attn_raw, specs.wo)
    if bp.post_attn_norm_scale is not None:   # gemma2 pre-residual norm
        attn_out = _norm(attn_out, bp.post_attn_norm_scale, None, cfg)

    if cfg.parallel_attn_mlp:
        # falcon new-decoder arch has a separate mlp norm (ln_mlp -> ln2);
        # falcon-7b/gptj share the single pre-norm
        mlp_in = (h_ln if bp.ln2_scale is None
                  else _norm(x, bp.ln2_scale, bp.ln2_bias, cfg))
        mlp_out, inner = _mlp(mlp_in, bp.mlp, specs, cfg)
        out = x + attn_out.astype(x.dtype) + mlp_out.astype(x.dtype)
    else:
        x = x + attn_out.astype(x.dtype)
        mlp_in = _norm(x, bp.ln2_scale, bp.ln2_bias, cfg)
        mlp_out, inner = _mlp(mlp_in, bp.mlp, specs, cfg)
        if bp.post_ffw_norm_scale is not None:
            mlp_out = _norm(mlp_out, bp.post_ffw_norm_scale, None, cfg)
        out = x + mlp_out.astype(x.dtype)

    stats = {}
    if collect_stats == "full":
        # raw per-linear input activations (the reference's benchbitsand
        # workflow benches kernels on saved real activations because outlier
        # behavior doesn't show on random data — SURVEY.md §4.3)
        stats = {"wqkv": h_ln, "wo": attn_raw, "up": mlp_in, "down": inner}
    elif collect_stats:
        stats = {
            "wqkv": _absmax_channels(h_ln),
            "wo": _absmax_channels(attn_raw),
            "up": _absmax_channels(mlp_in),
            "down": _absmax_channels(inner),
        }
    return out, stats


def forward(
    params: DecoderParams,
    tokens: jax.Array,             # [B, T] int32
    cache: KVCache,
    specs: DecoderSpecs,
    cfg: ModelConfig,
    kv_start: Optional[jax.Array] = None,  # [B] — first real slot per row,
                                   # for left-padded batched prompts
    collect_stats: bool = False,   # True: also return per-linear-group input
                                   # channel absmax (calibration pipeline);
                                   # "full": return the raw input activations
                                   # (real-activation kernel benching)
    slot_lengths: Optional[jax.Array] = None,  # [B] — per-slot sequence
                                   # positions (continuous batching). KV
                                   # writes scatter per row and cache.length
                                   # is ignored. T=1 is the decode step;
                                   # T>1 is a speculative-verify step (row
                                   # b's tokens at slot_lengths[b]..+T-1,
                                   # batch-major caches only).
    ring_mesh=None,                # static (close over via partial): Mesh +
    ring_axis: Optional[str] = None,   # axis name for sequence-parallel
                                   # ring-attention prefill. Only valid for a
                                   # FRESH-cache prefill chunk (cache.length
                                   # == 0 — the engine guarantees this); KV
                                   # still lands in the cache as usual.
    ring_head_axis: Optional[str] = None,  # TP axis for heads (TP x SP)
    decode_mesh=None,              # static (close over via partial): Mesh
                                   # for head-major flash decode — the
                                   # pallas call is opaque to GSPMD, so it
                                   # must run under shard_map on meshed
                                   # engines (flash_decode_sharded)
):
    """Run the decoder on a token chunk starting at cache.length.

    Returns (logits [B, T, V] f32, updated cache with length advanced by T).
    Works for prefill (T = prompt chunk) and decode (T = 1) alike — the
    reference needs two attention code paths (varlen prefill vs dense decode,
    attn.py:153-204); static-shape masking unifies them.
    """
    B, T = tokens.shape
    x = jnp.take(params.embed, tokens, axis=0).astype(jnp.dtype(specs.wqkv.out_dtype))
    if cfg.embed_multiplier != 1.0:
        # gemma: sqrt(hidden) embed scale, rounded to the activation dtype
        # exactly as HF does (GemmaModel normalizer tensor cast)
        x = x * jnp.asarray(cfg.embed_multiplier, x.dtype)

    if slot_lengths is not None:
        if T > 1:
            # speculative-verify step: row b's T tokens sit at positions
            # slot_lengths[b] .. +T-1. Supported on batch-major caches
            # (direct span scatter, KVCache.update_layer_slots) and on
            # head-major PER-ROW-TAIL pools (the serving default: all T
            # tokens stage in the row's tail window and the flash
            # kernel's tail attend covers them — attend_over's verify
            # branch). The stacked scan body's slot write is T=1-shaped.
            verify_tail_ok = (cache.k_tail is not None
                              and cache.tail_base is not None
                              and cache.tail_base.ndim == 1)
            if params.stacked is not None or (
                    cache.head_major and not verify_tail_ok):
                raise NotImplementedError(
                    "T>1 slot mode (speculative verify) needs the "
                    "python-loop runtime and a batch-major cache or a "
                    "per-row-tail (head-major flash) pool")
        q_slot = (slot_lengths[:, None]
                  + jnp.arange(T, dtype=jnp.int32)[None])      # [B, T]
        rope_pos = q_slot
    else:
        q_slot = cache.length + jnp.arange(T, dtype=jnp.int32)
        # logical (rope) positions discount left padding per row
        if kv_start is not None:
            rope_pos = jnp.maximum(q_slot[None, :] - kv_start[:, None], 0)
        else:
            rope_pos = q_slot
    rot = cfg.rotary_dim or cfg.head_dim_
    if cfg.rope_scaling_type == "llama3":
        rope_scaling = ("llama3", cfg.rope_scaling_factor,
                        cfg.rope_low_freq_factor, cfg.rope_high_freq_factor,
                        cfg.rope_original_max_position)
    elif cfg.rope_scaling_type == "linear":
        rope_scaling = ("linear", cfg.rope_scaling_factor)
    elif cfg.rope_scaling_type == "longrope":
        # static serving-context choice: caches sized past the pretrain
        # length use the long factors (HF switches on runtime seq_len;
        # the cache's max_seq IS this program's max sequence length).
        # 256 slack absorbs engine bucketing (round-to-128 + tail-window
        # padding) so a cache REQUESTED at the pretrain length doesn't
        # flip to long factors — and every harness sizing within the
        # slack picks the same factors (bit-consistency across engines)
        use_long = (cache.max_seq
                    > cfg.rope_original_max_position + 256)
        rope_scaling = ("longrope",
                        cfg.rope_long_factor if use_long
                        else cfg.rope_short_factor,
                        cfg.rope_attention_factor)
    else:
        rope_scaling = None
    cos, sin = rope_cos_sin(rope_pos, rot, cfg.rope_theta,
                            scaling=rope_scaling)
    if cfg.rope_style == "none":
        cos, sin = jnp.ones_like(cos), jnp.zeros_like(sin)  # identity rotation
    if params.pos_embed is not None:  # OPT learned positions
        pe = jnp.take(params.pos_embed, rope_pos, axis=0).astype(x.dtype)
        x = x + (pe[None] if rope_pos.ndim == 1 else pe)

    all_stats = {}
    quantized_kv = cache.quantized
    T_ = T
    kv_len = (slot_lengths + T_ if slot_lengths is not None
              else cache.length + T_)

    # sliding-window models reclaim KV slots (ring buffer): a window-sized
    # cache serves unbounded decode (reference WindowedCache.roll_kv,
    # fused/cache.py:25-34, as an index transform instead of a copy).
    # Head-major (flash) caches keep linear positions instead and window
    # via the kernel's per-row start offset — full-length cache, no
    # reclaim (the memory-for-speed trade of the flash opt-in).
    # alternating-window models (gemma2) can't reclaim: global layers
    # need the full history
    ring = (cfg.sliding_window is not None and not cache.head_major
            and cfg.sliding_window_pattern == 1)
    if ring and T > 1 and cache.max_seq < cfg.sliding_window + T:
        # a prefill chunk that straddles the wrap point would overwrite
        # positions still inside an in-chunk query's window (length is
        # traced data, so the guard must be static and conservative; the
        # batching pool sizes its one-shot prefill caches to clear it —
        # _admit_many)
        raise ValueError(
            f"ring KV cache needs max_seq >= sliding_window + chunk "
            f"({cache.max_seq} < {cfg.sliding_window} + {T})")

    from mixq_tpu.models.layers import alibi_slopes
    alibi = alibi_slopes(cfg.num_attention_heads) if cfg.alibi else None
    if alibi is not None and cfg.model_type == "falcon":
        # falcon applies (scores + alibi) * inv_norm_factor — i.e. the bias is
        # effectively slope/sqrt(hd) (modeling_falcon.py sdpa path divides the
        # alibi mask by sqrt(head_dim)); baichuan-13b adds raw slopes after
        # scaling. attend() uses the baichuan convention, so pre-scale here.
        alibi = alibi / jnp.sqrt(jnp.float32(cfg.head_dim_))

    head_major = cache.head_major
    if (head_major and cfg.sliding_window_pattern != 1
            and cfg.sliding_window is not None
            and cache.max_seq > cfg.sliding_window):
        # softcap + custom scale ride the flash kernel as static params
        # (r5); only a BINDING alternating window (gemma2 at contexts
        # beyond its 4096 window) still needs the XLA path, because the
        # kernel has no per-layer window starts
        raise NotImplementedError(
            "head-major (flash) KV cache: alternating-window (gemma2) "
            "models need max_seq <= sliding_window (the window must "
            "never bind) — create the cache with head_major=False for "
            "longer contexts")
    # gemma2 attention variations (all None/default elsewhere)
    attn_scale = (cfg.query_pre_attn_scalar ** -0.5
                  if cfg.query_pre_attn_scalar is not None else None)
    attn_softcap = cfg.attn_logit_softcap

    def layer_window(i):
        """Per-layer sliding window: gemma2 alternates local/global
        (window on layers with i % pattern == 0). The traced scan-path
        index is fine — the window only feeds masks, never shapes; a
        huge window == global attention."""
        if cfg.sliding_window is None:
            return None
        if cfg.sliding_window_pattern == 1:
            return cfg.sliding_window
        return jnp.where(i % cfg.sliding_window_pattern == 0,
                         cfg.sliding_window, 1 << 30)

    use_tail = cache.k_tail is not None
    if (use_tail and cfg.sliding_window is not None
            and cfg.sliding_window <= cache.k_tail.shape[1]):
        # the kernel's window start masks MAIN positions only; tail tokens
        # (the newest <=R) must always be inside the window
        raise ValueError(
            f"sliding_window ({cfg.sliding_window}) must exceed the tail "
            f"window depth R={cache.k_tail.shape[1]}")
    if use_tail and slot_lengths is not None and cache.tail_base.ndim != 1:
        raise ValueError(
            "slot-mode decode on a tail-staged cache needs per-row windows: "
            "create the pool cache with per_row_tail=True")
    # during a tail-staged decode step, the kernel reads
    # main[0:tail_base) + tail[0:kv_len - tail_base)  (per-row in slot
    # mode; for T>1 verify steps this is the count AFTER staging all T
    # tokens — the per-query causal prefix is taken in attend_over)
    tail_count = (kv_len - cache.tail_base
                  if use_tail and (T == 1 or slot_lengths is not None)
                  else None)
    # sliding-window decode on the head-major cache: the kernel's per-row
    # start offset IS the window (attend() convention: keep positions
    # >= q_pos - W + 1 = kv_len - W for the T=1 query)
    flash_start = kv_start
    if (head_major and cfg.sliding_window is not None and T == 1
            and cfg.sliding_window_pattern == 1):
        # uniform-window models only: with an alternating pattern the
        # head-major cache is restricted to max_seq <= window (above), so
        # no start offset is ever needed (global layers must NOT window)
        ws = jnp.maximum(
            jnp.asarray(kv_len, jnp.int32) - cfg.sliding_window, 0)
        flash_start = ws if kv_start is None else jnp.maximum(kv_start, ws)

    if specs.attn_impl == "pallas":
        raise ValueError(
            'attn_impl="pallas" (ops/pallas/decode_attention.py) was '
            'measured VPU-bound and superseded by attn_impl="flash" '
            "(ops/pallas/flash_decode.py); the old kernel is kept as a "
            "tests-only reference implementation")

    use_ring_prefill = (
        ring_axis is not None and T_ > 1 and slot_lengths is None
        and cfg.sliding_window is None and alibi is None
    )

    def attend_over(q, k_c, v_c, ks_c, vs_c, k_new=None, v_new=None,
                    full=None, win=cfg.sliding_window):
        if use_ring_prefill and k_new is not None:
            # sequence-parallel prefill: attention over the fresh chunk only
            # (== attention over the cache when the cache was empty)
            from mixq_tpu.parallel.ring_attention import ring_attention

            return ring_attention(q, k_new, v_new, ring_mesh, ring_axis,
                                  head_axis=ring_head_axis,
                                  kv_start=kv_start)
        if head_major:
            if T_ == 1:
                # the hot path: MXU flash-decode kernel streaming the
                # head-major cache (only HBM traffic is the cache bits).
                # `full` is the FULL stacked [L, ...] cache + layer index:
                # passing the k_c layer slice makes XLA materialize a copy
                # of the whole layer per call (custom-call operands can't
                # fuse with their producing slice) — the k_c/ks_c slice
                # args go dead here and are DCE'd.
                # Deliberately NOT aliased (return_cache): aliasing the
                # cache operands through the pallas call measured +6.3ms
                # per call on this stack (1-layer probe 8.0ms vs 1.7ms,
                # identical HLO op inventory — a runtime/relay penalty on
                # aliased custom-call buffers), far worse than the copies
                # it was meant to avoid.
                from mixq_tpu.ops.pallas.flash_decode import (
                    flash_decode_sharded)

                k5, v5, ks5, vs5, li, kt5, vt5, kts5, vts5 = full
                out = flash_decode_sharded(
                    q[:, 0], k5, v5,
                    cache.tail_base if kt5 is not None else kv_len,
                    ks5, vs5, kv_start=flash_start, layer=li,
                    k_tail=kt5, v_tail=vt5,
                    kt_scale=kts5, vt_scale=vts5,
                    tail_lens=tail_count if kt5 is not None else None,
                    alibi_slopes=alibi,
                    interpret=jax.default_backend() != "tpu",
                    mesh=decode_mesh,
                    softcap=attn_softcap or 0.0, scale=attn_scale)
                return out[:, None]
            if slot_lengths is not None:
                # speculative-verify step over a POPULATED per-row-tail
                # pool (VERDICT r4 item 3 — the spec x flash
                # composition): all T tokens were staged into the row's
                # tail window before attending, so query t attends
                # main[0:tail_base) + tail[0:(slot_lengths-tail_base)+t+1).
                # One kernel call per verify token: at acceptance a, a
                # dispatch emits ~a*T tokens for T cache reads — the
                # per-token KV traffic matches plain decode, and the
                # dispatch/RTT saving is the speculation win.
                from mixq_tpu.ops.pallas.flash_decode import (
                    flash_decode_sharded)

                k5, v5, ks5, vs5, li, kt5, vt5, kts5, vts5 = (
                    full)
                outs = []
                for t in range(T_):
                    if cfg.sliding_window is not None:
                        ws = jnp.maximum(
                            jnp.asarray(slot_lengths + t + 1, jnp.int32)
                            - cfg.sliding_window, 0)
                        start_t = (ws if kv_start is None
                                   else jnp.maximum(kv_start, ws))
                    else:
                        start_t = flash_start
                    outs.append(flash_decode_sharded(
                        q[:, t], k5, v5, cache.tail_base, ks5, vs5,
                        kv_start=start_t, layer=li,
                        k_tail=kt5, v_tail=vt5,
                        kt_scale=kts5, vt_scale=vts5,
                        tail_lens=tail_count - (T_ - 1 - t),
                        alibi_slopes=alibi,
                        interpret=jax.default_backend() != "tpu",
                        mesh=decode_mesh,
                        softcap=attn_softcap or 0.0, scale=attn_scale))
                return jnp.stack(outs, axis=1)
            # prefill chunk on a FRESH cache (the engine guarantees
            # length==0 at entry): attention over the chunk's own fp k/v ==
            # attention over the cache — no transposed cache read needed
            if T_ > 512:
                from mixq_tpu.models.layers import attend_chunked

                return attend_chunked(q, k_new, v_new, q_slot, kv_len,
                                      kv_start=kv_start,
                                      sliding_window=win, alibi=alibi,
                                      scale=attn_scale,
                                      softcap=attn_softcap)
            return attend(q, k_new, v_new, q_slot, kv_len,
                          kv_start=kv_start,
                          sliding_window=win, alibi=alibi,
                          scale=attn_scale, softcap=attn_softcap)
        if T_ > 512:   # long prefill: bound score memory to O(chunk * S)
            from mixq_tpu.models.layers import attend_chunked

            return attend_chunked(
                q, k_c, v_c, q_slot, kv_len,
                kv_start=kv_start, sliding_window=win,
                k_scale=ks_c, v_scale=vs_c, alibi=alibi,
                scale=attn_scale, softcap=attn_softcap, ring=ring)
        return attend(
            q, k_c, v_c, q_slot, kv_len,
            kv_start=kv_start, sliding_window=win,
            k_scale=ks_c, v_scale=vs_c,
            int8_compute=specs.attn_impl == "xla_int8", alibi=alibi,
            scale=attn_scale, softcap=attn_softcap, ring=ring)

    if params.stacked is not None:
        # scan over layers: one compiled block body (L-times smaller XLA
        # graph). The KV cache rides in the CARRY; per-layer slices are
        # gathered/scattered at the dynamic layer index. Compile-time win;
        # the python loop below avoids the slice copies and is the fast
        # steady-state runtime.
        L = cache.k.shape[0]

        def body(carry, xs):
            h, k_all, v_all, ks_all, vs_all, kt_all, vt_all, kts_all, \
                vts_all = carry
            bp, i = xs["bp"], xs["i"]

            def kv_apply(q, k, v):
                nonlocal k_all, v_all, ks_all, vs_all
                nonlocal kt_all, vt_all, kts_all, vts_all
                if use_tail and T_ == 1:
                    # write-combining tail decode write: reuse the KVCache
                    # tail logic on a view over the carry buffers (DUS
                    # accepts the traced layer index); slot-mode pools
                    # stage at per-row window slots
                    view = cache._replace(
                        k=k_all, v=v_all,
                        k_scale=ks_all if quantized_kv else None,
                        v_scale=vs_all if quantized_kv else None,
                        k_tail=kt_all, v_tail=vt_all,
                        kt_scale=kts_all if quantized_kv else None,
                        vt_scale=vts_all if quantized_kv else None,
                    )
                    tmp = (view._update_tail_slots(i, k, v, slot_lengths)
                           if slot_lengths is not None
                           else view._update_tail(i, k, v))
                    k_all, v_all = tmp.k, tmp.v
                    kt_all, vt_all = tmp.k_tail, tmp.v_tail
                    if quantized_kv:
                        ks_all, vs_all = tmp.k_scale, tmp.v_scale
                        kts_all, vts_all = tmp.kt_scale, tmp.vt_scale
                    return attend_over(
                        q, None, None, None, None, k, v,
                        full=(k_all, v_all,
                              ks_all if quantized_kv else None,
                              vs_all if quantized_kv else None, i,
                              kt_all, vt_all,
                              kts_all if quantized_kv else None,
                              vts_all if quantized_kv else None),
                        win=layer_window(i))
                k_c = jax.lax.dynamic_index_in_dim(k_all, i, 0, keepdims=False)
                v_c = jax.lax.dynamic_index_in_dim(v_all, i, 0, keepdims=False)
                write_pos = cache.length % cache.max_seq if ring else cache.length
                if head_major:           # layer slices [h, B, S(, d)]
                    at4 = (0, 0, write_pos, 0)
                    at3 = (0, 0, write_pos)
                else:
                    at4 = (0, write_pos, 0, 0)
                    at3 = (0, write_pos, 0)
                if slot_lengths is not None:
                    # continuous batching: T==1 decode writes scatter at
                    # per-row positions (update_layer_slots semantics inside
                    # the scan body — the CB engine can now run the stacked
                    # fast-compile path)
                    rows = jnp.arange(k.shape[0])
                    row_pos = (slot_lengths % cache.max_seq if ring
                               else slot_lengths)

                    if head_major:
                        def put(buf, val):  # buf [h,B,S,...], val [B,1,...]
                            return buf.at[:, rows, row_pos].set(
                                jnp.moveaxis(val[:, 0], 0, 1).astype(
                                    buf.dtype))
                    else:
                        def put(buf, val):   # buf [B,S,...], val [B,1,...]
                            return buf.at[rows, row_pos].set(
                                val[:, 0].astype(buf.dtype))
                elif ring and T_ > 1:
                    # a prefill chunk may straddle the wrap point: scatter at
                    # per-token ring slots (DUS would clamp at the edge)
                    slots = (cache.length
                             + jnp.arange(T_, dtype=jnp.int32)) % cache.max_seq

                    def put(buf, val):    # buf [B,S,...], val [B,T,...]
                        return buf.at[:, slots].set(val.astype(buf.dtype))
                elif head_major:
                    slots = None

                    def put(buf, val):   # val [B,T,h(,d)] -> head-major
                        if buf.ndim == 4:
                            val = jnp.moveaxis(val, 2, 0)        # [h,B,T,d]
                            return jax.lax.dynamic_update_slice(
                                buf, val.astype(buf.dtype), at4)
                        val = jnp.transpose(val, (2, 0, 1))      # [h,B,T]
                        return jax.lax.dynamic_update_slice(
                            buf, val.astype(buf.dtype), at3)
                else:
                    slots = None

                    def put(buf, val):
                        at = at4 if buf.ndim == 4 else at3
                        return jax.lax.dynamic_update_slice(
                            buf, val.astype(buf.dtype), at)
                if quantized_kv:
                    ks_c = jax.lax.dynamic_index_in_dim(ks_all, i, 0, False)
                    vs_c = jax.lax.dynamic_index_in_dim(vs_all, i, 0, False)
                    qk, sk = Q.quantize_kv(k)
                    qv, sv = Q.quantize_kv(v)
                    k_c = put(k_c, qk)
                    v_c = put(v_c, qv)
                    ks_c = put(ks_c, sk)
                    vs_c = put(vs_c, sv)
                    ks_all = jax.lax.dynamic_update_index_in_dim(
                        ks_all, ks_c, i, 0)
                    vs_all = jax.lax.dynamic_update_index_in_dim(
                        vs_all, vs_c, i, 0)
                else:
                    ks_c = vs_c = None
                    k_c = put(k_c, k)
                    v_c = put(v_c, v)
                k_all = jax.lax.dynamic_update_index_in_dim(k_all, k_c, i, 0)
                v_all = jax.lax.dynamic_update_index_in_dim(v_all, v_c, i, 0)
                return attend_over(
                    q, k_c, v_c, ks_c, vs_c, k, v,
                    full=(k_all, v_all,
                          ks_all if quantized_kv else None,
                          vs_all if quantized_kv else None, i,
                          None, None, None, None),
                    win=layer_window(i))

            h, stats = block_core(
                h, bp, kv_apply, cos, sin, specs, cfg, collect_stats)
            return (h, k_all, v_all, ks_all, vs_all,
                    kt_all, vt_all, kts_all, vts_all), stats

        ph = jnp.zeros((), jnp.int8)       # carry placeholder
        carry0 = (x, cache.k, cache.v,
                  cache.k_scale if quantized_kv else ph,
                  cache.v_scale if quantized_kv else ph,
                  cache.k_tail if use_tail else ph,
                  cache.v_tail if use_tail else ph,
                  cache.kt_scale if use_tail and quantized_kv else ph,
                  cache.vt_scale if use_tail and quantized_kv else ph)
        xs = {"bp": params.stacked, "i": jnp.arange(L, dtype=jnp.int32)}
        (x, k_all, v_all, ks_all, vs_all, kt_all, vt_all, kts_all,
         vts_all), stats_stacked = jax.lax.scan(body, carry0, xs)
        cache = cache._replace(
            k=k_all, v=v_all,
            k_scale=ks_all if quantized_kv else cache.k_scale,
            v_scale=vs_all if quantized_kv else cache.v_scale,
        )
        if use_tail:
            cache = cache._replace(
                k_tail=kt_all, v_tail=vt_all,
                kt_scale=kts_all if quantized_kv else cache.kt_scale,
                vt_scale=vts_all if quantized_kv else cache.vt_scale,
            )
        if collect_stats:
            for k_, v_ in stats_stacked.items():
                for i in range(L):
                    all_stats[f"{i}.{k_}"] = v_[i]
    else:
        for i, bp in enumerate(params.blocks):
            def kv_apply(q, k, v, i=i):
                nonlocal cache
                if slot_lengths is not None:
                    cache = cache.update_layer_slots(i, k, v, slot_lengths,
                                                     ring=ring)
                else:
                    cache = cache.update_layer(i, k, v, ring=ring)  # in-place DUS
                k_c, v_c, ks_c, vs_c = cache.layer_kv(i)
                return attend_over(
                    q, k_c, v_c, ks_c, vs_c, k, v,
                    full=(cache.k, cache.v, cache.k_scale, cache.v_scale, i,
                          cache.k_tail, cache.v_tail,
                          cache.kt_scale, cache.vt_scale),
                    win=layer_window(i))

            x, stats = block_core(
                x, bp, kv_apply, cos, sin, specs, cfg, collect_stats)
            if collect_stats:
                for k_, v_ in stats.items():
                    all_stats[f"{i}.{k_}"] = v_
    if slot_lengths is None:
        cache = cache.advance(T)

    x = _norm(x, params.lnf_scale, params.lnf_bias, cfg)
    head = params.lm_head if params.lm_head is not None else params.embed.T
    hdt = jnp.dtype(specs.wqkv.out_dtype)   # fp32 for exact-parity testing
    if _os.environ.get("MIXQ_ABLATE_HEAD", "0") == "1":
        # DIAGNOSTIC ONLY (per-op accounting, PROFILE_r04 §3.2): replace
        # the lm_head GEMM + weight read with a cheap broadcast so the
        # full-model A/B difference prices the head stage.
        logits = jnp.broadcast_to(
            x[..., :1].astype(jnp.float32),
            (*x.shape[:-1], cfg.vocab_size))
    else:
        logits = jnp.dot(
            x.astype(hdt), head.astype(hdt),
            preferred_element_type=jnp.float32,
        )
    if cfg.final_logit_softcap is not None:    # gemma2
        cap = cfg.final_logit_softcap
        logits = jnp.tanh(logits / cap) * cap
    if collect_stats:
        return logits, cache, all_stats
    return logits, cache


# ---------------------------------------------------------------------------
# Random init (tests) and fp construction
# ---------------------------------------------------------------------------

def init_decoder_params(
    key: jax.Array, cfg: ModelConfig, specs: Optional[DecoderSpecs] = None,
    dtype=jnp.float32,
) -> DecoderParams:
    """Random fp init (for tests/benchmarks without checkpoints). If `specs`
    is quantized, weights are quantized at init."""
    specs = specs or DecoderSpecs.fp16()
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    n_q, n_kv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)

    def lin(k, d_in, d_out, spec, scale=0.02):
        w = jax.random.normal(k, (d_in, d_out), dtype) * scale
        return from_float(w, spec)

    blocks = []
    use_ln_bias = cfg.layernorm == "layernorm"
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 7)
        attn = AttnParams(
            wq=lin(ks[0], H, n_q * hd, specs.wqkv),
            wk=lin(ks[5], H, n_kv * hd, specs.wqkv),
            wv=lin(ks[6], H, n_kv * hd, specs.wqkv),
            wo=lin(ks[1], n_q * hd, H, specs.wo),
            q_norm=jnp.ones((hd,), dtype) if cfg.qk_norm else None,
            k_norm=jnp.ones((hd,), dtype) if cfg.qk_norm else None,
        )
        if cfg.num_local_experts > 0:
            from mixq_tpu.ops.moe import MoEParams, expert_from_float

            E = cfg.num_local_experts
            ek = jax.random.split(ks[2], 4)
            exp = lambda k_, din, dout, spec: expert_from_float(
                jax.random.normal(k_, (E, din, dout), dtype) * 0.02, spec)
            mlp = MLPParams(
                up=None, gate=None, down=None,
                moe=MoEParams(
                    router=jax.random.normal(ek[0], (H, E), dtype) * 0.02,
                    gate=exp(ek[1], H, I, specs.gate),
                    up=exp(ek[2], H, I, specs.up),
                    down=exp(ek[3], I, H, specs.down)))
        else:
            mlp = MLPParams(
                up=lin(ks[2], H, I, specs.up),
                gate=(lin(ks[3], H, I, specs.gate)
                      if (cfg.gated_mlp if cfg.gated_mlp is not None
                          else cfg.hidden_act == "silu") else None),
                down=lin(ks[4], I, H, specs.down),
            )
        blocks.append(BlockParams(
            ln1_scale=jnp.ones((H,), dtype),
            ln1_bias=jnp.zeros((H,), dtype) if use_ln_bias else None,
            attn=attn,
            ln2_scale=None if cfg.parallel_attn_mlp else jnp.ones((H,), dtype),
            ln2_bias=(jnp.zeros((H,), dtype)
                      if use_ln_bias and not cfg.parallel_attn_mlp else None),
            mlp=mlp,
            post_attn_norm_scale=(jnp.ones((H,), dtype)
                                  if cfg.post_norms else None),
            post_ffw_norm_scale=(jnp.ones((H,), dtype)
                                 if cfg.post_norms else None),
        ))
    embed = jax.random.normal(keys[-2], (V, H), dtype) * 0.02
    lm_head = (None if cfg.tie_word_embeddings
               else jax.random.normal(keys[-1], (H, V), dtype) * 0.02)
    return DecoderParams(
        embed=embed,
        blocks=tuple(blocks),
        lnf_scale=jnp.ones((H,), dtype),
        lnf_bias=jnp.zeros((H,), dtype) if use_ln_bias else None,
        lm_head=lm_head,
    )
