"""Prompt-lookup speculative decoding (n-gram drafting, no draft model).

Greedy decode emits one token per forward; when the continuation repeats
spans already seen (code, quotes, structured output), the next tokens can
be GUESSED from the history and verified in one T=k forward — the model's
own argmax decides how much of the draft survives, so the output is
BIT-IDENTICAL to plain greedy decode, just fewer sequential steps.

TPU-native shape: the verify forward is the same static-shape `forward`
used everywhere (T=k fixed, jit-cached once); a rejected suffix simply
rewinds `cache.length` — stale KV slots beyond the accepted length are
masked by attention and overwritten by the next verify, so no cache
surgery happens. The reference has no speculative path at all.

Greedy-only by design (sampled acceptance needs rejection sampling);
batch-major caches only (the head-major flash cache's T>1 path serves
fresh-cache prefill, not mid-sequence verify).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.models.decoder import forward

_jverify = functools.partial(
    jax.jit, static_argnames=("specs", "cfg"), donate_argnums=(2,))(forward)


def propose_ngram(history: Sequence[int], n: int, k: int) -> List[int]:
    """Draft up to k tokens: find the most recent earlier occurrence of the
    trailing n-gram and copy what followed it (the prompt-lookup heuristic).
    Returns [] when the trailing n-gram never occurred before."""
    h = list(history)
    if len(h) <= n:
        return []
    tail = h[-n:]
    # most recent earlier match (recency wins: local repetition dominates)
    for start in range(len(h) - n - 1, -1, -1):
        if h[start:start + n] == tail:
            return h[start + n:start + n + k]
    return []


def generate_speculative(
    engine,
    prompt: Sequence[int],
    max_new_tokens: int = 128,
    ngram: int = 3,
    k: int = 8,
    eos_token_id: Optional[int] = None,
) -> Tuple[List[int], Dict[str, int]]:
    """Greedy generation with prompt-lookup speculation for ONE prompt.
    Returns (tokens, stats); tokens are bit-identical to plain greedy
    decode, in ~forwards/len(tokens) of the sequential steps."""
    from mixq_tpu.models.layers import KVCache
    from mixq_tpu.utils.shapes import round_up

    cfg, specs, ecfg = engine.model_cfg, engine.specs, engine.engine_cfg
    if engine.mesh is not None:
        raise NotImplementedError(
            "speculative decoding builds its own single-device cache; "
            "meshed engines are not supported yet — use engine.generate")
    n = len(prompt)
    if n > ecfg.max_seq_len:
        raise ValueError(
            f"prompt ({n} tokens) longer than max_seq_len "
            f"({ecfg.max_seq_len})")
    if n == 0:
        raise ValueError("empty prompt")
    Tp = min(round_up(n, ecfg.prefill_chunk), ecfg.max_seq_len)
    total = Tp + max_new_tokens + k
    # batch-major cache: the verify step is a mid-sequence T=k decode,
    # which the head-major flash path doesn't serve
    cache = KVCache.create(
        cfg.num_hidden_layers, 1, round_up(total, 128),
        cfg.num_key_value_heads, cfg.head_dim_,
        dtype=jnp.dtype(ecfg.kv_dtype))

    toks = np.zeros((1, Tp), np.int32)
    toks[0, Tp - n:] = prompt
    kv_start = jnp.asarray([Tp - n], jnp.int32)
    logits, cache = engine.prefill(jnp.asarray(toks), cache, kv_start)
    history = list(prompt)
    out: List[int] = [int(jnp.argmax(logits[0]))]
    history.append(out[0])
    stats = {"forwards": 1, "drafted": 0, "accepted": 0}

    while len(out) < max_new_tokens:
        if eos_token_id is not None and out[-1] == eos_token_id:
            break
        draft = propose_ngram(history, ngram, k - 1)
        # feed [last_token, draft...] padded to the static k: position j's
        # argmax is the model's token AFTER consuming feed[:j+1]
        feed = ([out[-1]] + draft + [0] * (k - 1 - len(draft)))[:k]
        n_draft = len(draft)
        logits, cache = _jverify(
            engine.params, jnp.asarray([feed], jnp.int32), cache,
            specs=specs, cfg=cfg, kv_start=kv_start)
        stats["forwards"] += 1
        stats["drafted"] += n_draft
        preds = np.asarray(jnp.argmax(logits[0], axis=-1))     # [k]
        accepted = 0
        for j in range(n_draft):
            if int(preds[j]) == draft[j]:
                accepted += 1
            else:
                break
        new_tokens = draft[:accepted] + [int(preds[accepted])]
        stats["accepted"] += accepted
        out.extend(new_tokens)
        history.extend(new_tokens)
        # rewind: the verify wrote k KV slots but only 1 + accepted of the
        # fed tokens are real; stale slots sit beyond `length`, masked and
        # overwritten by the next verify
        cache = cache._replace(
            length=cache.length - (k - (1 + accepted)))
        if eos_token_id is not None and eos_token_id in new_tokens:
            out = out[:len(out) - len(new_tokens)
                      + new_tokens.index(eos_token_id) + 1]
            break
    return out[:max_new_tokens], stats
