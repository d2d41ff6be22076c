"""AutoModel: one-call loading of fp16 / quantized checkpoints.

The reference's AutoForCausalLM (models/auto.py:26-53) + BaseForCausalLM
(models/base.py) surface, functional: returns (params, model_cfg, specs)
ready for InferenceEngine. Supported model families (reference registry
auto.py:6-15 + north-star additions): llama / llama-2 / llama-3, aquila,
baichuan, mistral, qwen2, falcon, gptj, opt, chatglm, gemma.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from mixq_tpu.config import EngineConfig, ModelConfig, QuantConfig
from mixq_tpu.engine.engine import InferenceEngine
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs
from mixq_tpu.models.hf import (
    TensorSource, config_from_hf, load_hf_config, params_from_source,
)
from mixq_tpu.quantize.checkpoint import load_checkpoint
from mixq_tpu.quantize.quantizer import quantize_model, resolve_specs

SUPPORTED_MODEL_TYPES = (
    "llama", "aquila", "baichuan", "mistral", "qwen2", "falcon", "gptj",
    "opt", "chatglm", "gemma", "gemma2", "mixtral", "qwen2_moe",
    "qwen3", "phi3", "starcoder2",
)


class AutoModel:
    """Entry points mirroring the reference's AutoForCausalLM."""

    @staticmethod
    def from_pretrained(
        path: str,
        quant_config: Optional[QuantConfig] = None,
        calib_batches: Optional[Iterable[np.ndarray]] = None,
        act_scales: Optional[Dict[str, np.ndarray]] = None,
    ) -> Tuple[DecoderParams, ModelConfig, DecoderSpecs]:
        """Load an HF checkpoint directory; quantize on the fly if
        quant_config is given (reference from_pretrained + quantize_mix,
        base.py:122-156 + :41-56)."""
        cfg = load_hf_config(path)
        if cfg.model_type not in SUPPORTED_MODEL_TYPES:
            raise ValueError(
                f"model_type {cfg.model_type} not supported "
                f"(have: {SUPPORTED_MODEL_TYPES})")
        src = TensorSource.from_safetensors_dir(path)
        if quant_config is None:
            specs = DecoderSpecs.fp16()
            return params_from_source(src, cfg, specs), cfg, specs
        params, specs = quantize_model(
            src, cfg, quant_config,
            calib_batches=calib_batches, act_scales=act_scales)
        return params, cfg, specs

    @staticmethod
    def from_quantized(
        path: str,
    ) -> Tuple[DecoderParams, ModelConfig, DecoderSpecs]:
        """Load a mixq_tpu quantized checkpoint (reference from_quantized,
        base.py:161-229)."""
        params, cfg, qcfg = load_checkpoint(path)
        return params, cfg, resolve_specs(qcfg)

    @staticmethod
    def engine(
        path: str,
        engine_config: Optional[EngineConfig] = None,
        **kwargs,
    ) -> InferenceEngine:
        """Convenience: build an InferenceEngine straight from a checkpoint
        directory (quantized if it has quant_config.json+manifest.json, else
        HF fp16)."""
        if os.path.exists(os.path.join(path, "manifest.json")):
            params, cfg, specs = AutoModel.from_quantized(path)
        else:
            params, cfg, specs = AutoModel.from_pretrained(path, **kwargs)
        return InferenceEngine(params, cfg, specs, engine_config)

    @staticmethod
    def serving_engine(
        path: str,
        engine_config: Optional[EngineConfig] = None,
        mesh=None,
        **kwargs,
    ):
        """Convenience: build a ContinuousBatchingEngine (slot-pool
        serving with per-request sampling) from a checkpoint directory."""
        from mixq_tpu.engine.batching import ContinuousBatchingEngine

        if os.path.exists(os.path.join(path, "manifest.json")):
            params, cfg, specs = AutoModel.from_quantized(path)
        else:
            params, cfg, specs = AutoModel.from_pretrained(path, **kwargs)
        return ContinuousBatchingEngine(params, cfg, specs, engine_config,
                                        mesh=mesh)
