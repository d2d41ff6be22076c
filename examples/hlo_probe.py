"""Dump optimized HLO + cost analysis of a 1-layer 7B-shaped decode step."""
import functools
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from bench import llama2_7b_cfg
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec

kv_name = sys.argv[1] if len(sys.argv) > 1 else "int8"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
attn_impl = sys.argv[4] if len(sys.argv) > 4 else "xla"
L = int(os.environ.get("PROBE_LAYERS", "1"))

cfg = llama2_7b_cfg(L)
specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
if attn_impl != "xla":
    import dataclasses
    specs = dataclasses.replace(specs, attn_impl=attn_impl)
params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs,
                             dtype=jnp.bfloat16)
from mixq_tpu.ops.pallas.flash_decode import use_head_major_cache

_hm = use_head_major_cache(attn_impl, cfg, S, jnp.dtype(kv_name).itemsize)
_tail = int(os.environ.get("PROBE_TAIL", "0"))
cache = KVCache.create(L, B, S, cfg.num_key_value_heads, cfg.head_dim_,
                       jnp.dtype(kv_name), head_major=_hm,
                       tail_r=_tail if _hm else 0)


@functools.partial(jax.jit, donate_argnums=(2,))
def decode(params, tokens, cache):
    logits, cache = forward(params, tokens, cache, specs, cfg)
    return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache


tokens = jnp.ones((B, 1), jnp.int32)
lowered = decode.lower(params, tokens, cache)
compiled = lowered.compile()

if os.environ.get("PROBE_TIME", "0") == "1":
    # chain-time the 1-layer step (relay rule: dependent chains ended by
    # one device_get, two lengths, difference) — in-model per-layer cost
    # without the 32-layer compile wait
    import time

    nxt, cache = decode(params, tokens, cache)
    _ = jax.device_get(nxt)

    def run(n, nxt, cache):
        t0 = time.time()
        for _ in range(n):
            nxt, cache = decode(params, nxt[:, None], cache)
        _ = jax.device_get(nxt)
        return time.time() - t0, nxt, cache

    _, nxt, cache = run(4, nxt, cache)
    t1, nxt, cache = run(32, nxt, cache)
    t2, nxt, cache = run(64, nxt, cache)
    print(f"PROBE_TIME per-step: {(t2 - t1) / 32 * 1e3:.3f} ms")
tag = f"{kv_name}_B{B}_S{S}_{attn_impl}_L{L}"
with open(f"/tmp/hlo_{tag}.txt", "w") as f:
    f.write(compiled.as_text())
try:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    with open(f"/tmp/cost_{tag}.txt", "w") as f:
        for k in sorted(ca):
            f.write(f"{k}: {ca[k]}\n")
except Exception as e:
    print("cost_analysis failed:", e)
try:
    ma = compiled.memory_analysis()
    print("memory:", ma)
except Exception as e:
    print("memory_analysis failed:", e)
print("wrote /tmp/hlo_%s.txt" % tag)
