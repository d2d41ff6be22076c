"""Offline quantization driver: policy resolution + model conversion.

Replaces the reference's MixQuantizer (quantize/mixquant.py:16-318) and the
module-swap machinery (models/base.py:273-404). The flow is:

    specs  = resolve_specs(quant_cfg)                  # policy -> DecoderSpecs
    scales = collect_act_scales(fp_params, ...)        # calibration (4-bit/QUIK)
    osets  = outlier_sets_from_scales(scales, qcfg)
    qparams = params_from_source(src, cfg, specs, osets)
    save_checkpoint(dir, qparams, cfg, qcfg)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional

import numpy as np

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs
from mixq_tpu.models.hf import TensorSource, params_from_source
from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.quantize.calibration import (
    collect_act_scales, outlier_sets_from_scales,
)


# per-architecture weight-only defaults (reference weight_only_map,
# utils/module.py:4-12 — empty for every family except GPT-J's fc_out)
ARCH_WEIGHT_ONLY = {"gptj": ("fc_out",)}


def apply_arch_policy(qcfg: QuantConfig, model_type: str) -> QuantConfig:
    """Fold the architecture's default weight-only table into a QuantConfig
    that doesn't override it."""
    arch = ARCH_WEIGHT_ONLY.get(model_type)
    if arch and not qcfg.weight_only_names:
        return dataclasses.replace(qcfg, weight_only_names=arch)
    return qcfg


def resolve_specs(qcfg: QuantConfig) -> DecoderSpecs:
    """Resolve the per-linear precision policy from a QuantConfig.

    Implements the reference policy tables (utils/module.py:2-12):
    - eightbit_only_names (down_proj/o_proj/fc_out) are forced to 8-bit in
      4-bit models (models/base.py:308-312)
    - weight_only_names use W8A16
    The decoder's linear slots map to reference names:
      wqkv -> {q,k,v}_proj/W_pack, wo -> o_proj, up -> up_proj/fc_in,
      gate -> gate_proj, down -> down_proj/fc_out.
    """
    slot_names = {
        "wqkv": ("q_proj", "k_proj", "v_proj", "W_pack"),
        "wo": ("o_proj", "dense", "out_proj"),
        "up": ("up_proj", "fc_in", "dense_h_to_4h"),
        "gate": ("gate_proj",),
        "down": ("down_proj", "fc_out", "dense_4h_to_h"),
    }

    def spec_for(slot: str) -> LinearSpec:
        names = slot_names[slot]
        if (qcfg.version == "WEIGHT_ONLY"
                or any(n in qcfg.weight_only_names for n in names)):
            return LinearSpec(w_bit=qcfg.w_bit, a_bit=16,
                              version="WEIGHT_ONLY",
                              outlier_budget=qcfg.outlier_budget)
        w_bit, a_bit = qcfg.w_bit, qcfg.a_bit
        if qcfg.w_bit < 8 and any(n in qcfg.eightbit_only_names for n in names):
            w_bit, a_bit = 8, 8
        if qcfg.version == "FP16" or w_bit >= 16:
            return LinearSpec(version="FP16", w_bit=16)
        if qcfg.version == "QUIK" and qcfg.q_group_size > 0:
            # quik_linear uses per-channel w_scale [N]; grouped [G, N] scales
            # would break the w_scale broadcast and the reduced_w zero-point
            # correction (needs per-group column sums) — fail early instead
            # of at trace time with an opaque shape error
            raise ValueError(
                "QUIK does not support group quantization "
                f"(q_group_size={qcfg.q_group_size}); use q_group_size=0")
        return LinearSpec(
            w_bit=w_bit, a_bit=a_bit,
            version=qcfg.version if qcfg.version in ("MIX", "QUIK") else "MIX",
            outlier_budget=qcfg.outlier_budget,
            group_size=qcfg.q_group_size,
        )

    base = {s: spec_for(s) for s in slot_names}
    base["gate"] = dataclasses.replace(base["gate"], fuse="silu")
    return DecoderSpecs(**base)


def quantize_model(
    src: TensorSource,
    cfg: ModelConfig,
    qcfg: QuantConfig,
    calib_batches: Optional[Iterable[np.ndarray]] = None,
    act_scales: Optional[Dict[str, np.ndarray]] = None,
    fp_params: Optional[DecoderParams] = None,
) -> tuple[DecoderParams, DecoderSpecs]:
    """Full offline quantization (basic_quant_mix.py / basic_quant_quik.py
    equivalent).

    For 8-bit MIX: outlier sets start empty (the online predictor fills them
    during engine warmup — reference linear.py:200-227).
    For 4-bit / QUIK: outlier sets come from calibration scales
    (top-budget channels, mixquant.py:201-208).
    """
    qcfg = apply_arch_policy(qcfg, cfg.model_type)
    specs = resolve_specs(qcfg)
    osets: Optional[Dict[str, Q.OutlierSet]] = None

    needs_calib = qcfg.w_bit <= 4 or qcfg.version == "QUIK"
    if needs_calib:
        if act_scales is None:
            if calib_batches is None:
                raise ValueError(
                    "4-bit/QUIK quantization needs calib_batches or act_scales")
            if fp_params is None:
                fp_params = params_from_source(src, cfg, DecoderSpecs.fp16())
            act_scales = collect_act_scales(fp_params, cfg, calib_batches)
        osets = outlier_sets_from_scales(act_scales, qcfg)
    elif qcfg.version == "MIX" and qcfg.w_bit == 8:
        # empty sets (full budget reserved): the forward then always includes
        # the outlier fp GEMM with static shapes, and the online predictor
        # fills the sets during engine warmup without changing the compiled
        # program structure
        osets = empty_outlier_sets(cfg, qcfg)

    qparams = params_from_source(src, cfg, specs, osets)
    return qparams, specs


def empty_outlier_sets(
    cfg: ModelConfig, qcfg: QuantConfig
) -> Dict[str, Q.OutlierSet]:
    """Budget-reserved empty outlier sets for every linear group."""
    H = cfg.hidden_size
    k_of = {
        "wqkv": H,
        "wo": cfg.num_attention_heads * cfg.head_dim_,
        "up": H,
        "down": cfg.intermediate_size,
    }
    out = {}
    for i in range(cfg.num_hidden_layers):
        for slot, k in k_of.items():
            out[f"{i}.{slot}"] = Q.empty_outlier_set(k, qcfg.outlier_budget)
    return out
