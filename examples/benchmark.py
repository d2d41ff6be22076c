"""Prefill+decode benchmark over a context-length grid (reference
examples/benchmark.py:144-152 sweeps context 32->2048; the repo's
benchflops.py sweeps batch — this driver sweeps context).

For each context length C: time prefill of a [batch, C] prompt and the
decode step with C tokens of KV resident. Timing uses the relay-safe
chained-delta scheme (two chain lengths, differenced — see bench.py).

  python examples/benchmark.py [--preset 7b|tiny | --model_path <dir>]
      [--batch 32] [--contexts 32,64,...,2048] [--kv_dtype int8]
      [--steps 8] [--output_csv out/ctx_grid.csv]

Random weights by default (--preset): decode/prefill cost doesn't depend on
weight values, so the grid runs without a checkpoint.
"""
import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--preset", default="7b", choices=("7b", "tiny"))
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--contexts", default="32,64,128,256,512,1024,2048")
    ap.add_argument("--kv_dtype", default="int8")
    ap.add_argument("--attn", default="xla",
                    help="attention impl (xla|flash|xla_int8|pallas)")
    ap.add_argument("--steps", type=int, default=8,
                    help="chain length for decode timing")
    ap.add_argument("--prefill_chains", type=int, default=2,
                    help="chain length for prefill timing")
    ap.add_argument("--output_csv", default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu — the TPU-relay "
                         "sitecustomize overrides JAX_PLATFORMS)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import functools

    import jax.numpy as jnp
    import numpy as np

    from mixq_tpu.models import DecoderSpecs, KVCache
    from mixq_tpu.models.decoder import forward, init_decoder_params
    from mixq_tpu.ops.mixed_linear import LinearSpec

    if args.model_path:
        from mixq_tpu.models.auto import AutoModel

        params, cfg, specs = AutoModel.from_quantized(args.model_path)
    else:
        from bench import llama2_7b_cfg, tiny_cfg

        layers = args.layers or (32 if args.preset == "7b" else 2)
        cfg = llama2_7b_cfg(layers) if args.preset == "7b" else tiny_cfg(layers)
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs,
                                     dtype=jnp.bfloat16)
    if args.attn != "xla":
        import dataclasses

        specs = dataclasses.replace(specs, attn_impl=args.attn)
    params = jax.device_put(params)
    jax.block_until_ready(params)

    B = args.batch
    kv = jnp.dtype(args.kv_dtype)

    @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=())
    def step(params, tokens, cache):
        logits, cache = forward(params, tokens, cache, specs, cfg)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    rows = []
    for C in [int(c) for c in args.contexts.split(",")]:
        S = C + 4 * args.steps + 8          # decode headroom past the context
        from mixq_tpu.ops.pallas.flash_decode import (DEFAULT_TAIL_R,
                                                      flash_decode_supported)

        hm_ = (args.attn == "flash" and flash_decode_supported(
            cfg.num_key_value_heads, S, cfg.head_dim_, kv.itemsize))
        tail_r = DEFAULT_TAIL_R if hm_ else 0
        mk_cache = lambda: KVCache.create(   # noqa: E731
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, kv, head_major=hm_, tail_r=tail_r)

        flush = jax.jit(lambda c: c.flush_tail(), donate_argnums=(0,))
        n_dec = [0]

        def decode_once(nxt, cache):
            nxt, cache = step(params, nxt[:, None], cache)
            n_dec[0] += 1
            if tail_r and n_dec[0] % tail_r == 0:
                cache = flush(cache)       # amortized window write
            return nxt, cache

        # ---- prefill: chains of dependent prefills (the argmax of one
        # seeds the next prompt) at two lengths, differenced
        base = jnp.ones((B, C), jnp.int32)

        def prefill_chain(n, tok0):
            t0 = time.time()
            nxt = tok0
            for _ in range(n):
                prompt = base.at[:, 0].set(nxt)
                nxt, _ = step(params, prompt, mk_cache())
            _ = jax.device_get(nxt)
            return time.time() - t0, nxt

        nxt0 = jnp.ones((B,), jnp.int32)
        _, nxt0 = prefill_chain(1, nxt0)     # compile + warm
        n = args.prefill_chains
        t1, nxt0 = prefill_chain(n, nxt0)
        t2, nxt0 = prefill_chain(2 * n, nxt0)
        prefill_ms = max((t2 - t1) / n, 1e-9) * 1000

        # ---- decode with C tokens of KV resident
        cache = mk_cache()
        nxt, cache = step(params, base, cache)
        nxt, cache = decode_once(nxt, cache)            # warm decode sig
        _ = jax.device_get(nxt)

        def decode_chain(n, nxt, cache):
            t0 = time.time()
            for _ in range(n):
                nxt, cache = decode_once(nxt, cache)
            _ = jax.device_get(nxt)
            return time.time() - t0, nxt, cache

        t1, nxt, cache = decode_chain(args.steps, nxt, cache)
        t2, nxt, cache = decode_chain(2 * args.steps, nxt, cache)
        decode_ms = max((t2 - t1) / args.steps, 1e-9) * 1000

        row = {
            "context": C, "batch": B, "kv_dtype": args.kv_dtype,
            "prefill_ms": round(prefill_ms, 2),
            "prefill_tokens_per_s": round(B * C / (prefill_ms / 1000), 1),
            "decode_ms_per_step": round(decode_ms, 2),
            "decode_tokens_per_s": round(B / (decode_ms / 1000), 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.output_csv:
        os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
        with open(args.output_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()
