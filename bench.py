"""Decode-throughput benchmark (the reference benchflops.py workload:
Llama-2-7B W8A8O16, decode steps at large batch — README.md:69-76 baseline
10,609.8 tokens/s on A100-PCIE-40GB).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs on whatever platform JAX resolves (the driver points it at one TPU
chip). Model weights are random — decode throughput does not depend on
weight values. Shapes are env-tunable:
  BENCH_BATCH (default 64), BENCH_SEQ (KV slots, default 64),
  BENCH_DECODE_STEPS (default 16), BENCH_LAYERS (default 32 = Llama-2-7B),
  BENCH_PRESET (tiny|7b, default 7b).
"""
import json
import os
import sys
import time

import jax

# persistent compilation cache: 7B graphs take minutes to compile; cache
# hits make re-runs start in seconds (harmless if the backend ignores it)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params, stack_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec

BASELINE_TOKENS_PER_S = 10609.8     # reference README.md:69-76
PEAK_INT8_OPS = 394e12              # v5e MXU int8 peak (VERDICT r3 item 9:
                                    # track the floor gap per round as MFU)


def matmul_flops_per_token(cfg) -> float:
    """Model FLOPs per decoded token: 2 x matmul params (the standard MFU
    numerator — linear projections + lm_head; attention score/value FLOPs
    are O(S) and excluded, matching PROFILE_r03 §3's GEMM-floor accounting)."""
    H, I = cfg.hidden_size, cfg.intermediate_size
    nq, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim_)
    attn = H * nq * hd + 2 * H * nkv * hd + nq * hd * H
    if cfg.num_local_experts > 0:
        mlp = H * cfg.num_local_experts                      # router
        mlp += cfg.num_experts_per_tok * 3 * H * I           # active experts
    else:
        mlp = 3 * H * I                                      # gated (SwiGLU)
    head = H * cfg.vocab_size
    return 2.0 * (cfg.num_hidden_layers * (attn + mlp) + head)


def llama2_7b_cfg(n_layers: int) -> ModelConfig:
    return ModelConfig(
        model_type="llama", vocab_size=int(os.environ.get(
            "BENCH_VOCAB", "32000")),   # head-stage A/B instrument:
        # a 2048-vocab run prices the lm_head GEMM+read by difference
        # (the MIXQ_ABLATE_HEAD broadcast replacement measured 69.7ms —
        # slower than base, i.e. the instrument itself was pathological)
        hidden_size=4096,
        intermediate_size=11008, num_hidden_layers=n_layers,
        num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096,
    )


def tiny_cfg(n_layers: int) -> ModelConfig:
    return ModelConfig(
        model_type="llama", vocab_size=1024, hidden_size=256,
        intermediate_size=704, num_hidden_layers=n_layers,
        num_attention_heads=4, num_key_value_heads=4,
    )


def moe_cfg(n_layers: int) -> ModelConfig:
    """Mixtral-shaped sparse-MoE decode workload, scaled to one v5e chip
    (BENCH_EXPERTS experts, top-2 routing; full 8x7B int8 experts are
    ~1.4GB/layer — HBM demands the scale-down, VERDICT r2 item 7)."""
    E = int(os.environ.get("BENCH_EXPERTS", "4"))
    return ModelConfig(
        model_type="mixtral", vocab_size=32000, hidden_size=4096,
        intermediate_size=4096, num_hidden_layers=n_layers,
        num_attention_heads=32, num_key_value_heads=8,
        num_local_experts=E, num_experts_per_tok=2,
        moe_capacity_factor=float(os.environ.get("BENCH_MOE_CAP", "0")),
    )


def main():
    # Fail fast and VISIBLY if the TPU relay is unreachable: backend init
    # otherwise hangs indefinitely inside jax.devices() (observed during
    # relay outages) and the run records nothing. The watchdog is cancelled
    # the moment the backend answers.
    import threading

    def _startup_timeout():
        print(json.dumps({
            "metric": "llama2_7b_w8a8o16_decode_throughput",
            "value": 0.0, "unit": "tokens/s", "vs_baseline": 0.0,
            "error": "backend init timed out (TPU relay unreachable)",
        }), flush=True)
        os._exit(3)

    watchdog = threading.Timer(
        float(os.environ.get("BENCH_STARTUP_TIMEOUT", "240")),
        _startup_timeout)
    watchdog.daemon = True
    watchdog.start()
    n_dev = len(jax.devices())
    watchdog.cancel()
    print(f"backend up: {n_dev} device(s)", file=sys.stderr)

    # defaults = the best stable measured config (BENCH_MATRIX.jsonl r3:
    # B=512 S=32 bf16 xla -> 13,750 tok/s, 1.296x the A100 baseline at the
    # reference workload's batch; int8-KV XLA attend collapses past ~10.5GB
    # weights+KV — a relay artifact the flash kernel sidesteps at S >= 128)
    preset = os.environ.get("BENCH_PRESET", "7b")
    B = int(os.environ.get("BENCH_BATCH", "512"))
    S = int(os.environ.get("BENCH_SEQ", "32"))
    steps = int(os.environ.get("BENCH_DECODE_STEPS", "32"))
    kv_dtype = jnp.dtype(os.environ.get("BENCH_KV", "bfloat16"))
    n_layers = int(os.environ.get(
        "BENCH_LAYERS",
        {"7b": "32", "moe": "8"}.get(preset, "2")))

    cfg = {"7b": llama2_7b_cfg, "moe": moe_cfg,
           "tiny": tiny_cfg}[preset](n_layers)
    w_bits = int(os.environ.get("BENCH_W", "8"))
    version = os.environ.get("BENCH_VERSION", "MIX")
    if version == "QUIK":
        from mixq_tpu.config import QuantConfig
        from mixq_tpu.quantize import resolve_specs
        specs = resolve_specs(QuantConfig.quik_w4a4())
    elif w_bits == 4:
        from mixq_tpu.config import QuantConfig
        from mixq_tpu.quantize import resolve_specs
        # W4A4 with the reference policy (down/o forced 8-bit);
        # BENCH_GROUP>0 adds per-group weight scales (q_group_size);
        # BENCH_FULLW4=1 drops the 8-bit-only policy so down/o go W4 too
        # (the FULL weight-byte reduction — VERDICT r3 item 4; pair with
        # BENCH_GROUP to buy the accuracy back with grouped scales)
        kw = {}
        if os.environ.get("BENCH_FULLW4", "0") == "1":
            kw["eightbit_only_names"] = ()
        specs = resolve_specs(QuantConfig.w4a4(
            q_group_size=int(os.environ.get("BENCH_GROUP", "-1")), **kw))
    else:
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    attn_impl = os.environ.get("BENCH_ATTN", "auto")
    import dataclasses
    specs = dataclasses.replace(specs, attn_impl=attn_impl)

    t0 = time.time()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs,
                                 dtype=jnp.bfloat16)
    if os.environ.get("BENCH_SCAN", "0") == "1":
        params = stack_decoder_params(params)   # scan path: fast compile
    params = jax.device_put(params)
    jax.block_until_ready(params)
    print(f"init {time.time()-t0:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    from mixq_tpu.ops.pallas.flash_decode import (DEFAULT_TAIL_R,
                                                  use_head_major_cache)

    head_major = use_head_major_cache(attn_impl, cfg, S, kv_dtype.itemsize)
    # tail-staged decode writes (amortize the head-major scatter); BENCH_TAIL
    # overrides the default depth, 0 disables
    tail_r = int(os.environ.get("BENCH_TAIL", str(DEFAULT_TAIL_R))) \
        if head_major else 0
    print(f"attn={attn_impl} head_major={head_major} tail_r={tail_r} "
          f"kv={kv_dtype}", file=sys.stderr)
    cache = KVCache.create(cfg.num_hidden_layers, B, S,
                           cfg.num_key_value_heads, cfg.head_dim_, kv_dtype,
                           head_major=head_major, tail_r=tail_r)

    import functools

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode(params, tokens, cache):
        logits, cache = forward(params, tokens, cache, specs, cfg)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    @functools.partial(jax.jit, donate_argnums=(0,))
    def flush(cache):
        return cache.flush_tail()

    step_count = 0

    def one_step(nxt, cache):
        # tail-staged caches flush once per full R-window (its own
        # program — the amortized main-cache write, included in timing)
        nonlocal step_count
        nxt, cache = decode(params, nxt[:, None], cache)
        step_count += 1
        if tail_r and step_count % tail_r == 0:
            cache = flush(cache)
        return nxt, cache

    tokens = jnp.ones((B, 1), jnp.int32)

    if os.environ.get("BENCH_DEBUG_MEM", "0") == "1":
        ma = decode.lower(params, tokens, cache).compile().memory_analysis()
        print(f"memory_analysis: {ma}", file=sys.stderr)

    t0 = time.time()
    nxt, cache = decode(params, tokens, cache)
    _ = jax.device_get(nxt)
    if tail_r:
        cache = flush(cache)           # compile the flush program too
    print(f"compile+first step {time.time()-t0:.1f}s", file=sys.stderr)

    # warmup (reference uses 10 warmup steps, benchflops.py:110)
    for _ in range(3):
        nxt, cache = one_step(nxt, cache)
    _ = jax.device_get(nxt)

    # NOTE: through the remote-execution relay, block_until_ready() returns
    # before the device finishes, so we time CHAINS of dependent steps ended
    # by one host fetch, at two lengths N and 2N; the difference cancels the
    # constant dispatch/fetch overhead.
    def run_chain(n, nxt, cache):
        t0 = time.time()
        for _ in range(n):
            nxt, cache = one_step(nxt, cache)
        _ = jax.device_get(nxt)
        return time.time() - t0, nxt, cache

    t1, nxt, cache = run_chain(steps, nxt, cache)
    t2, nxt, cache = run_chain(2 * steps, nxt, cache)
    per_step = max((t2 - t1) / steps, 1e-9)
    tokens_per_s = B / per_step
    print(f"chain timing: t({steps})={t1*1000:.1f}ms t({2*steps})={t2*1000:.1f}ms"
          f" -> {per_step*1000:.2f}ms/step", file=sys.stderr)

    metric = ("mixtral_moe_w8a8o16_decode_throughput" if preset == "moe"
              else "llama2_7b_w8a8o16_decode_throughput")
    mfu = matmul_flops_per_token(cfg) * tokens_per_s / PEAK_INT8_OPS
    print(json.dumps({
        "metric": metric,
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / BASELINE_TOKENS_PER_S, 3),
        "mfu": round(mfu, 4),
        "ms_per_step": round(per_step * 1e3, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:                      # pragma: no cover
        # one retry: the remote TPU tunnel occasionally drops a request
        print(f"bench attempt failed ({type(e).__name__}: {e}); retrying",
              file=sys.stderr)
        main()
