"""Latency benchmark: TTFT (prefill) + per-decode-step latency percentiles.

The reference's benchlatency.py (302 lines) times every decode step
individually with cuda.synchronize and reports the distribution; this is the
TPU equivalent. Two views are reported:

  - end-to-end per-step latency: each step timed host-side, ended with one
    jax.device_get. Through the axon relay this includes a constant
    dispatch/fetch round-trip, so the harness first estimates that constant
    (median of empty-fetch timings) and subtracts it from every sample;
    percentiles are over the corrected samples.
  - chain-derived device mean: the bench.py chain-difference method, as the
    trustworthy central tendency to sanity-check the corrected samples.

Outputs one JSON line and optionally a CSV
(p50/p90/p95/p99/mean decode ms, TTFT ms).

Env knobs: BENCH_BATCH, BENCH_SEQ, BENCH_PROMPT (prefill length),
BENCH_DECODE_STEPS (sample count), BENCH_KV, BENCH_W, BENCH_PRESET(tiny|7b),
BENCH_CSV (path to append).
"""
import csv
import functools
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from bench import llama2_7b_cfg, tiny_cfg
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec


def percentiles(samples_ms):
    a = np.asarray(samples_ms)
    return {
        "p50": round(float(np.percentile(a, 50)), 3),
        "p90": round(float(np.percentile(a, 90)), 3),
        "p95": round(float(np.percentile(a, 95)), 3),
        "p99": round(float(np.percentile(a, 99)), 3),
        "mean": round(float(a.mean()), 3),
        "max": round(float(a.max()), 3),
    }


def main():
    preset = os.environ.get("BENCH_PRESET", "7b")
    B = int(os.environ.get("BENCH_BATCH", "256"))
    S = int(os.environ.get("BENCH_SEQ", "128"))
    P = int(os.environ.get("BENCH_PROMPT", "64"))
    steps = int(os.environ.get("BENCH_DECODE_STEPS", "48"))
    kv_dtype = jnp.dtype(os.environ.get("BENCH_KV", "bfloat16"))
    n_layers = int(os.environ.get(
        "BENCH_LAYERS", "32" if preset == "7b" else "2"))
    cfg = (llama2_7b_cfg(n_layers) if preset == "7b" else tiny_cfg(n_layers))
    w_bits = int(os.environ.get("BENCH_W", "8"))
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=w_bits, a_bit=w_bits)
                                 if w_bits < 16
                                 else LinearSpec(version="FP16", w_bit=16))
    attn_impl = os.environ.get("BENCH_ATTN", "auto")
    import dataclasses

    specs = dataclasses.replace(specs, attn_impl=attn_impl)

    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs,
                                 dtype=jnp.bfloat16)
    params = jax.device_put(params)
    jax.block_until_ready(params)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tokens, cache):
        logits, cache = forward(params, tokens, cache, specs, cfg)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    from mixq_tpu.ops.pallas.flash_decode import (DEFAULT_TAIL_R,
                                                  use_head_major_cache)

    hm = use_head_major_cache(attn_impl, cfg, S, kv_dtype.itemsize)
    tail_r = (int(os.environ.get("BENCH_TAIL", str(DEFAULT_TAIL_R)))
              if hm else 0)

    def new_cache():
        return KVCache.create(cfg.num_hidden_layers, B, S,
                              cfg.num_key_value_heads, cfg.head_dim_, kv_dtype,
                              head_major=hm, tail_r=tail_r)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def flush(cache):
        return cache.flush_tail()

    dstep = [0]

    def decode_once(nxt, cache):
        # the per-step latency INCLUDES the amortized window flush: the
        # flush step's sample is the honest p99 contributor
        nxt, cache = step(params, nxt[:, None], cache)
        dstep[0] += 1
        if tail_r and dstep[0] % tail_r == 0:
            cache = flush(cache)
        return nxt, cache

    prompt = jnp.ones((B, P), jnp.int32)

    # compile both shapes
    t0 = time.time()
    nxt, cache = step(params, prompt, new_cache())
    nxt, cache = step(params, nxt[:, None], cache)
    jax.device_get(nxt)
    print(f"compile {time.time()-t0:.1f}s", file=sys.stderr)

    # constant dispatch/fetch overhead: median time to fetch an
    # already-computed tiny array (the relay round trip)
    fetch = []
    for _ in range(15):
        t0 = time.time()
        jax.device_get(nxt)
        fetch.append(time.time() - t0)
    c = float(np.median(fetch))
    print(f"fetch overhead ~{c*1000:.1f}ms", file=sys.stderr)

    # --- TTFT: prefill latency over repeats (fresh cache each time) -------
    # keep exactly ONE cache alive across repeats: the compile-phase cache
    # plus two loop caches used to coexist, tripling KV memory and OOMing
    # at 7B B=64 S=256 int8 (r2 sweep RESOURCE_EXHAUSTED)
    cache = None
    ttft = []
    for _ in range(5):
        cache = None                  # free BEFORE allocating (rebinding
        cache = new_cache()           # alone briefly doubles KV memory)
        t0 = time.time()
        nxt, cache = step(params, prompt, cache)
        jax.device_get(nxt)
        ttft.append(max(time.time() - t0 - c, 0.0) * 1000)

    # --- per-step decode latency (continues from the last prefill) --------
    nxt, cache = decode_once(nxt, cache)   # warm (compiles flush too)
    samples = []
    for _ in range(steps):
        t0 = time.time()
        nxt, cache = decode_once(nxt, cache)
        jax.device_get(nxt)
        samples.append(max(time.time() - t0 - c, 0.0) * 1000)

    # --- chain-derived device mean (sanity) -------------------------------
    def chain(n, nxt, cache):
        t0 = time.time()
        for _ in range(n):
            nxt, cache = decode_once(nxt, cache)
        jax.device_get(nxt)
        return time.time() - t0, nxt, cache

    t1, nxt, cache = chain(16, nxt, cache)
    t2, nxt, cache = chain(32, nxt, cache)
    chain_ms = max((t2 - t1) / 16, 1e-9) * 1000

    dec = percentiles(samples)
    row = {
        "metric": "llama2_7b_decode_latency" if preset == "7b"
        else "tiny_decode_latency",
        "batch": B, "kv": str(kv_dtype), "w_bit": w_bits,
        "prompt_len": P,
        "ttft_ms": round(float(np.median(ttft)), 2),
        "decode_ms": dec,
        "chain_mean_ms": round(chain_ms, 3),
        "tokens_per_s_at_p50": round(B / (dec["p50"] / 1000), 1)
        if dec["p50"] > 0 else None,
    }
    print(json.dumps(row))
    out_csv = os.environ.get("BENCH_CSV")
    if out_csv:
        flat = {k: v for k, v in row.items() if not isinstance(v, dict)}
        flat.update({f"decode_{k}_ms": v for k, v in dec.items()})
        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        exists = os.path.exists(out_csv)
        with open(out_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(flat))
            if not exists:
                w.writeheader()
            w.writerow(flat)


if __name__ == "__main__":
    main()
