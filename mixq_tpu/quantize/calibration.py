"""Calibration: per-linear input-channel activation statistics.

Functional equivalent of the reference's hook-based act-scale capture
(examples/smooth_quant_get_act.py:13-51: forward hooks on every nn.Linear
recording per-channel max |abs| over 512 Pile samples -> act_scales/<model>.pt).
Here the decoder forward itself emits the statistics (collect_stats=True), so
there is nothing to hook and the capture is jit-compiled.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs, forward
from mixq_tpu.models.layers import KVCache
from mixq_tpu.ops import quant as Q


def collect_act_scales(
    params: DecoderParams,
    cfg: ModelConfig,
    batches: Iterable[np.ndarray],      # each [B, T] int32 token batch
    specs: Optional[DecoderSpecs] = None,
    max_seq: int = 2048,
) -> Dict[str, np.ndarray]:
    """Run fp forwards over calibration batches, return per-linear-group
    channel absmax: {"{layer}.{wqkv|wo|up|down}": [K] f32}. The running
    reduction is max (matching the reference hook's torch.max update,
    smooth_quant_get_act.py:24-30)."""
    specs = specs or DecoderSpecs.fp16()

    stats_fn = jax.jit(
        lambda p, t, c: forward(p, t, c, specs, cfg, collect_stats=True)[2],
        static_argnames=(),
    )

    acc: Dict[str, np.ndarray] = {}
    for batch in batches:
        batch = np.asarray(batch, np.int32)
        cache = KVCache.create(
            cfg.num_hidden_layers, batch.shape[0], batch.shape[1],
            cfg.num_key_value_heads, cfg.head_dim_, jnp.bfloat16,
        )
        stats = jax.device_get(stats_fn(params, jnp.asarray(batch), cache))
        for k, v in stats.items():
            acc[k] = np.maximum(acc[k], v) if k in acc else np.asarray(v)
    return acc


def save_act_scales(scales: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **scales)


def load_act_scales(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def outlier_sets_from_scales(
    scales: Dict[str, np.ndarray],
    qcfg: QuantConfig,
    n_outliers: Optional[int] = None,
) -> Dict[str, "Q.OutlierSet"]:
    """Pick top-N channels per linear group as static fp16 outliers
    (reference mixquant.py:201-208 / linear.py:125: top fp_features channels
    by calib scale; 128 for MIX-4bit, 256 for QUIK)."""
    n = n_outliers if n_outliers is not None else qcfg.outlier_budget
    out = {}
    for key, s in scales.items():
        k = s.shape[0]
        nn = min(n, k, qcfg.outlier_budget)
        out[key] = Q.top_k_outliers_from_scales(
            jnp.asarray(s), n=nn, k=k, budget=qcfg.outlier_budget)
    return out


def sigma_outlier_sets_from_scales(
    scales: Dict[str, np.ndarray],
    qcfg: QuantConfig,
) -> Dict[str, "Q.OutlierSet"]:
    """Alternative policy: channels whose calib absmax exceeds sigma
    (the online predictor's threshold, applied offline), capped at budget."""
    out = {}
    for key, s in scales.items():
        k = s.shape[0]
        n = int(min((s > qcfg.outlier_sigma).sum(), qcfg.outlier_budget))
        if n == 0:
            out[key] = Q.empty_outlier_set(k, qcfg.outlier_budget)
        else:
            out[key] = Q.top_k_outliers_from_scales(
                jnp.asarray(s), n=n, k=k, budget=qcfg.outlier_budget)
    return out
