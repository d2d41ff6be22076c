"""Online outlier predictor — warmup-time detection and weight promotion.

The reference's core novelty (linear.py:200-227 + Cache.py): during the
first `stop`(=2) forwards, any activation channel whose |x| exceeds sigma(=6)
is added to a sticky per-linear outlier set; its weight rows are promoted to
fp16 (`weight_cache`) and zeroed in the int weight; after warmup the set is
frozen.

TPU-native shape: the jitted steady-state forward always includes the
(budget-padded) outlier fp GEMM, so promotion only rewrites *param values* —
the compiled program never changes. Warmup runs the stats-collecting forward
(host loop, a handful of steps), updates the OutlierSets functionally, and
returns new params.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.config import ModelConfig
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs, forward
from mixq_tpu.models.layers import KVCache
from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import (
    LinearSpec, MixLinearParams, promote_outliers,
)


def warmup_online_outliers(
    params: DecoderParams,
    cfg: ModelConfig,
    specs: DecoderSpecs,
    batches: Iterable[np.ndarray],       # warmup token batches [B, T]
    sigma: float = 6.0,
    max_steps: int = 2,
) -> Tuple[DecoderParams, Dict[str, int]]:
    """Run up to `max_steps` warmup forwards, detecting and promoting
    outlier channels after each (reference cache.stop lifecycle). Returns
    (updated params, {stats_key: outlier_count}).
    """
    stats_fn = jax.jit(
        lambda p, t, c: forward(p, t, c, specs, cfg, collect_stats=True)[2])

    restack = params.stacked is not None
    if restack:  # promotion walks per-layer blocks
        from mixq_tpu.models.decoder import (
            stack_decoder_params, unstack_decoder_params,
        )

        params = unstack_decoder_params(params)

    counts: Dict[str, int] = {}
    for step, batch in enumerate(batches):
        if step >= max_steps:
            break
        batch = np.asarray(batch, np.int32)
        cache = KVCache.create(
            cfg.num_hidden_layers, batch.shape[0], batch.shape[1],
            cfg.num_key_value_heads, cfg.head_dim_, jnp.bfloat16)
        stats = stats_fn(params, jnp.asarray(batch), cache)
        params = _promote_from_stats(params, specs, stats, sigma)
    # report final counts
    for i, bp in enumerate(params.blocks):
        for slot, lin in (("wqkv", bp.attn.wq), ("wo", bp.attn.wo),
                          ("up", bp.mlp.up), ("down", bp.mlp.down)):
            # sparse-MoE blocks have no dense up/down (experts skip the
            # outlier machinery by design — ops/moe.py docstring)
            if lin is not None and lin.out_count is not None:
                counts[f"{i}.{slot}"] = int(lin.out_count)
    if restack:
        params = stack_decoder_params(params)
    return params, counts


def _promote_linear(
    lin: Optional[MixLinearParams],
    spec: LinearSpec,
    ch_max: jax.Array,
    sigma: float,
) -> Optional[MixLinearParams]:
    if lin is None or lin.out_ind is None or spec.version not in ("MIX",):
        return lin
    oset = lin.outlier_set
    new_oset = Q.detect_new_outliers_from_absmax(
        jnp.asarray(ch_max), oset, sigma)
    if int(new_oset.count) == int(oset.count):
        return lin
    return promote_outliers(lin, None, new_oset, spec)


def _promote_from_stats(
    params: DecoderParams,
    specs: DecoderSpecs,
    stats: Dict[str, jax.Array],
    sigma: float,
) -> DecoderParams:
    blocks = []
    for i, bp in enumerate(params.blocks):
        qkv_max = stats[f"{i}.wqkv"]
        wq = _promote_linear(bp.attn.wq, specs.wqkv, qkv_max, sigma)
        wk = _promote_linear(bp.attn.wk, specs.wqkv, qkv_max, sigma)
        wv = _promote_linear(bp.attn.wv, specs.wqkv, qkv_max, sigma)
        wo = _promote_linear(bp.attn.wo, specs.wo, stats[f"{i}.wo"], sigma)
        up_max = stats[f"{i}.up"]
        up = _promote_linear(bp.mlp.up, specs.up, up_max, sigma)
        gate = (_promote_linear(bp.mlp.gate, specs.gate, up_max, sigma)
                if bp.mlp.gate is not None else None)
        down = _promote_linear(bp.mlp.down, specs.down,
                               stats[f"{i}.down"], sigma)
        # _replace keeps every other field (qk norms, gemma2 post-norms,
        # sparse-MoE params) — full re-construction silently dropped them
        blocks.append(bp._replace(
            attn=bp.attn._replace(wq=wq, wk=wk, wv=wv, wo=wo),
            mlp=bp.mlp._replace(up=up, gate=gate, down=down),
        ))
    return params._replace(blocks=tuple(blocks))
