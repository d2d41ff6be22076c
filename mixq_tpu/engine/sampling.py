"""Token sampling strategies (greedy / temperature / top-k / top-p).

The reference delegates sampling to HF `model.generate()` (benchflops.py,
mmlu.py use greedy); here sampling is a pure jittable function so the whole
decode step — forward + sample — compiles into one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0       # 0 = greedy
    top_k: int = 0                 # 0 = disabled
    top_p: float = 1.0             # 1 = disabled


def sample(
    logits: jax.Array,             # [B, V] f32
    key: Optional[jax.Array],
    params: SamplingParams,
) -> jax.Array:
    """Sample next tokens [B] int32."""
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / params.temperature

    if params.top_k > 0:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)

    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def chosen_logprob(logits: jax.Array, tok: jax.Array) -> jax.Array:
    """Log-probability of the chosen tokens under the RAW distribution
    (the standard serving report): logits [B, V], tok [B] -> [B] f32."""
    return jnp.take_along_axis(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
        tok[:, None], axis=1)[:, 0]


def sample_per_slot(
    logits: jax.Array,             # [B, V] f32
    key: jax.Array,
    temperature: jax.Array,        # [B] f32; <=0 = greedy for that row
    top_k: jax.Array,              # [B] i32; 0 = disabled
    top_p: jax.Array,              # [B] f32; 1 = disabled
) -> jax.Array:
    """Per-ROW sampling params (continuous batching serves heterogeneous
    requests: each slot carries its request's config; the reference's
    single generate() call has no counterpart). Vectorized masking —
    top-k by per-row rank, top-p by per-row cumulative cutoff — so one
    compiled program serves any mix. The sort-based masking only runs
    when some row actually samples (lax.cond skips it for all-greedy
    batches at runtime).

    Tie rule differs from sample(): rank-based top-k keeps EXACTLY k
    candidates, while sample()'s threshold form keeps every logit equal
    to the k-th value — tied distributions can diverge between the CB
    engine (this sampler) and InferenceEngine.generate (sample())."""
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sampled(_):
        t = jnp.maximum(temperature, 1e-6)[:, None]
        l = logits / t
        # per-row top-k: mask everything ranked >= k (k=0 -> keep all).
        # NOTE ties: this keeps exactly k entries (the static-param
        # sample() keeps every logit equal to the k-th value).
        order = jnp.argsort(-l, axis=-1)
        ranks = jnp.zeros((B, V), jnp.int32).at[
            jnp.arange(B)[:, None], order].set(jnp.arange(V)[None])
        k_eff = jnp.where(top_k > 0, top_k, V)[:, None]
        l = jnp.where(ranks < k_eff, l, -jnp.inf)
        # per-row top-p on the already-k-masked logits
        sl = jnp.sort(l, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sl, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sl, cutoff_idx, axis=-1)
        l = jnp.where(l < cutoff, -jnp.inf, l)
        return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)

    tok = jax.lax.cond(jnp.all(temperature <= 0.0),
                       lambda _: greedy, sampled, operand=None)
    return jnp.where(temperature <= 0.0, greedy, tok)
