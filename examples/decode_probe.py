"""Multi-config 1-layer decode-step probe in ONE process.

Cross-process chain timings through the relay vary run-to-run (CLAUDE.md);
comparing attention impls or cache shapes is only meaningful within a
single process. This probe compiles a 1-layer 7B-shaped decode step for
each (attn_impl, S, kv) config, chain-times them interleaved, and prints
one JSON line per config.

Env: PROBE_CONFIGS="impl:S:kv,impl:S:kv,..." (default covers the flash
gate decision), PROBE_B (default 256), PROBE_CHAIN (default 32),
PROBE_ROUNDS (default 2 — configs are re-timed round-robin and the
fastest round kept, de-noising relay jitter).
"""
import dataclasses
import functools
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import llama2_7b_cfg
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.ops.pallas.flash_decode import (DEFAULT_TAIL_R,
                                              use_head_major_cache)

B = int(os.environ.get("PROBE_B", "256"))
CHAIN = int(os.environ.get("PROBE_CHAIN", "32"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "2"))
CONFIGS = os.environ.get(
    "PROBE_CONFIGS",
    "flash:128:int8,xla_int8:128:int8,xla:128:int8,xla:128:bfloat16",
).split(",")

cfg = llama2_7b_cfg(1)
base = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
print("# init params...", file=sys.stderr, flush=True)
params = init_decoder_params(jax.random.PRNGKey(0), cfg, base,
                             dtype=jnp.bfloat16)
print("# device_put...", file=sys.stderr, flush=True)
params = jax.device_put(params)
jax.block_until_ready(params)
print("# params ready", file=sys.stderr, flush=True)


class Config:
    def __init__(self, spec_str):
        impl, s, kv = spec_str.strip().split(":")
        tail_r = 0
        if "+tail" in impl:                  # e.g. "flash+tail" or
            impl, _, rs = impl.partition("+tail")   # "flash+tail16"
            tail_r = int(rs) if rs else DEFAULT_TAIL_R
        self.impl, self.S, self.kv = impl, int(s), jnp.dtype(kv)
        self.name = spec_str.strip()
        specs = dataclasses.replace(base, attn_impl=impl)
        hm = use_head_major_cache(impl, cfg, self.S, self.kv.itemsize)

        # params is an explicit jit ARG (not a closure capture): closed-over
        # arrays are lowered as embedded HLO constants, and the ~0.5GB
        # compile payload reliably wedges the relay's compile ingest
        # (observed: probe stuck in tcp_sendmsg for 20+ min while bench.py,
        # which passes params explicitly, compiled the same step fine)
        @functools.partial(jax.jit, donate_argnums=(2,),
                           static_argnames=())
        def decode(params, tokens, cache):
            logits, cache = forward(params, tokens, cache, specs, cfg)
            return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

        @functools.partial(jax.jit, donate_argnums=(0,))
        def flush(cache):
            return cache.flush_tail()

        self.tail_r = tail_r if hm else 0
        self.flush = flush
        self.decode = lambda tokens, cache: decode(params, tokens, cache)
        self.new_cache = lambda: KVCache.create(
            1, B, self.S, cfg.num_key_value_heads, cfg.head_dim_, self.kv,
            head_major=hm, tail_r=tail_r if hm else 0)
        self.best_ms = float("inf")

    def time_once(self):
        cache = self.new_cache()
        tokens = jnp.ones((B, 1), jnp.int32)
        nxt, cache = self.decode(tokens, cache)     # warm
        _ = jax.device_get(nxt)
        if self.tail_r:
            cache = self.flush(cache)               # warm the flush too
        self._step = 0

        def step(nxt, cache):
            nxt, cache = self.decode(nxt[:, None], cache)
            self._step += 1
            if self.tail_r and self._step % self.tail_r == 0:
                cache = self.flush(cache)           # amortized window write
            return nxt, cache

        def run(n, nxt, cache):
            t0 = time.time()
            for _ in range(n):
                nxt, cache = step(nxt, cache)
            _ = jax.device_get(nxt)
            return time.time() - t0, nxt, cache

        _, nxt, cache = run(4, nxt, cache)
        t1, nxt, cache = run(CHAIN, nxt, cache)
        t2, nxt, cache = run(2 * CHAIN, nxt, cache)
        ms = max((t2 - t1) / CHAIN, 1e-9) * 1e3
        self.best_ms = min(self.best_ms, ms)
        return ms


def main():
    configs = []
    for s in CONFIGS:
        c = Config(s)
        t0 = time.time()
        try:
            c.time_once()                     # compile + first timing
        except Exception as e:                # noqa: BLE001 (OOM etc.)
            print(json.dumps({"config": c.name,
                              "error": f"{type(e).__name__}: {e}"[:200]}))
            continue
        print(f"# {c.name}: compile+time {time.time()-t0:.0f}s "
              f"first={c.best_ms:.3f}ms", file=sys.stderr)
        configs.append(c)
    for _ in range(ROUNDS - 1):               # interleaved re-times
        for c in configs:
            c.time_once()
    for c in configs:
        print(json.dumps({"config": c.name, "B": B,
                          "ms_per_step_1layer": round(c.best_ms, 3)}))


if __name__ == "__main__":
    main()
