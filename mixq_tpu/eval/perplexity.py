"""Sliding-window perplexity evaluation.

Port of the reference's llama.cpp-style Perplexity
(utils/utils/perplexity_utils.py:10-235) so numbers are directly comparable:
  - the token stream is cut into n_ctx windows
  - the first token of each window is replaced by BOS (:184-187)
  - NLL is accumulated over the second half of each window only (:202-210)
  - ppl = exp(total_nll / count)

Unlike the reference (one window at a time, tqdm over parts), windows are
batched into [B, n_ctx] and evaluated in one jitted forward each — the same
math, at TPU-friendly shapes. This whole file is also the PPL-parity gate:
BASELINE.md requires W8A8O16 PPL within 0.1 of FP16.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.config import ModelConfig
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs, forward
from mixq_tpu.models.layers import KVCache


@dataclasses.dataclass
class PerplexityResult:
    ppl: float
    nll: float
    n_tokens: int
    n_windows: int

    def __repr__(self):
        return (f"PerplexityResult(ppl={self.ppl:.4f}, tokens={self.n_tokens}, "
                f"windows={self.n_windows})")


def _window_nll(params, tokens, specs, cfg, kv_dtype):
    """Per-window NLL over the second half. tokens: [B, n_ctx] -> [B]."""
    B, n_ctx = tokens.shape
    cache = KVCache.create(
        cfg.num_hidden_layers, B, n_ctx, cfg.num_key_value_heads,
        cfg.head_dim_, kv_dtype,
    )
    logits, _ = forward(params, tokens, cache, specs, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # logits[:, t] predicts tokens[:, t+1]; count t+1 in [n_ctx/2, n_ctx)
    targets = tokens[:, 1:]
    pred_lp = jnp.take_along_axis(
        logp[:, :-1], targets[..., None], axis=-1)[..., 0]   # [B, n_ctx-1]
    start = n_ctx // 2
    mask = (jnp.arange(1, n_ctx) >= start).astype(jnp.float32)
    return -jnp.sum(pred_lp * mask[None, :], axis=-1)        # [B]


def compute_perplexity(
    params: DecoderParams,
    cfg: ModelConfig,
    token_ids: np.ndarray,          # [N] full token stream of the dataset
    specs: Optional[DecoderSpecs] = None,
    n_ctx: int = 512,
    batch_size: int = 8,
    bos_token_id: int = 1,
    kv_dtype=jnp.bfloat16,
    max_windows: Optional[int] = None,
) -> PerplexityResult:
    specs = specs or DecoderSpecs.fp16()
    token_ids = np.asarray(token_ids, np.int32).reshape(-1)
    n_windows = len(token_ids) // n_ctx
    if max_windows is not None:
        n_windows = min(n_windows, max_windows)
    if n_windows == 0:
        raise ValueError(f"need at least {n_ctx} tokens, got {len(token_ids)}")

    windows = token_ids[: n_windows * n_ctx].reshape(n_windows, n_ctx).copy()
    windows[:, 0] = bos_token_id          # BOS substitution (reference :184-187)

    nll_fn = jax.jit(lambda p, t: _window_nll(p, t, specs, cfg, kv_dtype))

    total_nll, total_count = 0.0, 0
    for i in range(0, n_windows, batch_size):
        batch = windows[i: i + batch_size]
        n_real = batch.shape[0]
        if n_real < batch_size:  # pad to the jitted shape; ignore pad rows
            pad = batch_size - n_real
            batch = np.concatenate([batch, batch[:1].repeat(pad, 0)], axis=0)
        per_window = np.asarray(nll_fn(params, jnp.asarray(batch)))
        total_nll += float(per_window[:n_real].sum())
        total_count += n_real * (n_ctx - n_ctx // 2)

    ppl = math.exp(total_nll / total_count)
    return PerplexityResult(ppl=ppl, nll=total_nll, n_tokens=total_count,
                            n_windows=n_windows)
