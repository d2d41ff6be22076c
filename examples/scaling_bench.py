"""Multi-chip/multi-host scaling-efficiency harness (north star: >=85%
tokens/s scaling efficiency at N>=2 hosts — BASELINE.md).

Measures decode tokens/s at 1 device vs the full mesh (TP, DP or both) and
reports efficiency = throughput_N / (N * throughput_1). On a real pod run it
under `python examples/scaling_bench.py` on every host after
`jax.distributed.initialize()`; single-host it uses all local devices.

  python examples/scaling_bench.py [--preset tiny|7b] [--batch 64]
      [--mode tp|dp] [--steps 16] [--multihost]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_tokens_per_s(params, cfg, specs, mesh, B, S, steps, kv_dtype):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mixq_tpu.models import KVCache
    from mixq_tpu.models.decoder import forward
    from mixq_tpu.parallel import shard_decoder_params, shard_kv_cache

    if mesh is not None:
        params = shard_decoder_params(params, mesh)

    cache = KVCache.create(cfg.num_hidden_layers, B, S,
                           cfg.num_key_value_heads, cfg.head_dim_, kv_dtype)
    tokens = jnp.ones((B, 1), jnp.int32)
    if mesh is not None:
        cache = shard_kv_cache(cache, mesh)
        tokens = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode(params, tokens, cache):
        logits, cache = forward(params, tokens, cache, specs, cfg)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    nxt, cache = decode(params, tokens, cache)
    # Warm the chained-call signature too: nxt[:, None] can carry a
    # different sharding than the initial tokens, and an untimed compile
    # here keeps the first timed chain honest.
    nxt, cache = decode(params, nxt[:, None], cache)
    _ = jax.device_get(nxt)

    def chain(n, nxt, cache):
        t0 = time.time()
        for _ in range(n):
            nxt, cache = decode(params, nxt[:, None], cache)
        _ = jax.device_get(nxt)
        return time.time() - t0, nxt, cache

    t1, nxt, cache = chain(steps, nxt, cache)
    t2, nxt, cache = chain(2 * steps, nxt, cache)
    per_step = max((t2 - t1) / steps, 1e-9)
    return B / per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=("tiny", "7b"))
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=32)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--mode", default="tp", choices=("tp", "dp"))
    ap.add_argument("--kv", default="bfloat16")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() first")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu — needed because "
                         "the TPU-relay sitecustomize overrides JAX_PLATFORMS)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.multihost:
        from mixq_tpu.parallel import initialize_distributed

        initialize_distributed()

    import jax
    import jax.numpy as jnp

    from mixq_tpu.models import DecoderSpecs
    from mixq_tpu.models.decoder import init_decoder_params
    from mixq_tpu.ops.mixed_linear import LinearSpec
    from mixq_tpu.parallel import make_mesh, multihost_mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import llama2_7b_cfg, tiny_cfg

    cfg = (llama2_7b_cfg(32) if args.preset == "7b"
           else tiny_cfg(2))
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs,
                                 dtype=jnp.bfloat16)

    n = jax.device_count()
    kv = jnp.dtype(args.kv)

    tps1 = bench_tokens_per_s(params, cfg, specs, None, args.batch, args.seq,
                              args.steps, kv)

    if args.multihost and jax.process_count() > 1:
        mesh = multihost_mesh()
    else:
        mesh = make_mesh((n, 1) if args.mode == "dp" else (1, n))
    B_n = args.batch * (n if args.mode == "dp" else 1)
    tps_n = bench_tokens_per_s(params, cfg, specs, mesh, B_n, args.seq,
                               args.steps, kv)

    eff = tps_n / (n * tps1) if args.mode == "dp" else tps_n / tps1
    print(json.dumps({
        "devices": n, "mode": args.mode,
        "tokens_per_s_1dev": round(tps1, 1),
        "tokens_per_s_mesh": round(tps_n, 1),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
