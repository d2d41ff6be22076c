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


def propose_ngram_device(hist: jax.Array, hlen: jax.Array, n: int, k: int
                         ) -> Tuple[jax.Array, jax.Array]:
    """Vectorized prompt-lookup drafting for a whole slot batch ON DEVICE —
    the jittable form of `propose_ngram`, row for row, so a decode window
    can draft+verify+accept R times in ONE dispatch (the host-loop spec
    path pays a ~100ms relay round-trip per verify forward; the window
    pays one per R forwards — the same economics as step_window).

    hist: [B, H] int32 per-slot token history (left-aligned), hlen: [B]
    valid lengths. Returns (draft [B, k] int32, draft_len [B] int32):
    per row, up to k followers of the most recent EARLIER occurrence of
    the trailing n-gram (0 when it never occurred — same semantics as
    propose_ngram(history, n, k), differentially tested)."""
    B, H = hist.shape
    P = H - n + 1                       # candidate n-gram start positions
    tail_idx = hlen[:, None] - n + jnp.arange(n)[None, :]
    tail = jnp.take_along_axis(hist, jnp.clip(tail_idx, 0, H - 1), axis=1)
    m = jnp.ones((B, P), bool)
    for j in range(n):                  # static unroll; n is tiny (2-4)
        m &= hist[:, j:P + j] == tail[:, j:j + 1]
    p = jnp.arange(P)[None, :]
    # earlier occurrence only, with at least one follower in-history
    # (propose_ngram scans start <= len-n-1), and a long-enough history
    m &= p <= hlen[:, None] - n - 1
    m &= hlen[:, None] > n
    p_star = jnp.max(jnp.where(m, p, -1), axis=1)              # [B]
    has = p_star >= 0
    fol_idx = p_star[:, None] + n + jnp.arange(k)[None, :]
    draft = jnp.take_along_axis(hist, jnp.clip(fol_idx, 0, H - 1), axis=1)
    draft_len = jnp.where(
        has, jnp.minimum(k, hlen - (p_star + n)), 0).astype(jnp.int32)
    return draft.astype(jnp.int32), draft_len


def accept_greedy(preds: jax.Array, draft: jax.Array, draft_len: jax.Array
                  ) -> jax.Array:
    """Per-row accepted-prefix length: how many leading draft tokens the
    model's own argmax agrees with (preds[j] consumed feed[:j+1], so
    agreement at j validates position j+1's context). preds/draft [B, k],
    draft_len [B]; returns [B] int32 in [0, draft_len]."""
    j = jnp.arange(draft.shape[1])[None, :]
    match = (preds == draft) & (j < draft_len[:, None])
    lead = jnp.cumprod(match.astype(jnp.int32), axis=1)
    return jnp.sum(lead, axis=1).astype(jnp.int32)


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
