"""Engine throughput benchmark CLI (reference benchflops.py): decode
tokens/s at a batch sweep, per backend, CSV output.

  python benchflops.py --model_path <dir> [--batch_sizes 32,64,128] \
      [--n_generate 32] [--kv_dtype int8] [--output_csv out.csv]

Unlike bench.py (the driver's fixed single-number harness on random
weights), this loads a real checkpoint through the full engine.
"""
import argparse
import csv
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--batch_sizes", default="32,64")
    ap.add_argument("--prompt_len", type=int, default=16)
    ap.add_argument("--n_generate", type=int, default=32)
    ap.add_argument("--kv_dtype", default="int8")
    ap.add_argument("--max_seq", type=int, default=None)
    ap.add_argument("--output_csv", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mixq_tpu.config import EngineConfig
    from mixq_tpu.engine import InferenceEngine
    from mixq_tpu.models.auto import AutoModel
    from mixq_tpu.models.decoder import stack_decoder_params

    if os.path.exists(os.path.join(args.model_path, "manifest.json")):
        params, cfg, specs = AutoModel.from_quantized(args.model_path)
    else:
        params, cfg, specs = AutoModel.from_pretrained(args.model_path)

    max_seq = args.max_seq or (args.prompt_len + args.n_generate)
    rows = []
    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        engine = InferenceEngine(
            params, cfg, specs,
            EngineConfig(max_seq_len=max_seq, prefill_chunk=args.prompt_len,
                         kv_dtype=args.kv_dtype))
        rng = np.random.RandomState(0)
        prompts = rng.randint(1, cfg.vocab_size,
                              (bs, args.prompt_len)).astype(np.int32)
        cache = engine.new_cache(bs, max_seq)
        logits, cache = engine.prefill(jnp.asarray(prompts), cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        _ = jax.device_get(nxt)

        # timing: chained steps, delta of two chain lengths (relay-safe);
        # tail-staged caches flush once per window (engine contract)
        steps = 0

        def chain(n, nxt, cache):
            nonlocal steps
            t0 = time.time()
            for _ in range(n):
                logits, cache = engine.decode_step(nxt[:, None], cache)
                steps += 1
                cache = engine.flush_if_due(cache, steps)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            _ = jax.device_get(nxt)
            return time.time() - t0, nxt, cache

        n = args.n_generate
        t1, nxt, cache = chain(n, nxt, cache)
        t2, nxt, cache = chain(2 * n, nxt, cache)
        per_step = max((t2 - t1) / n, 1e-9)
        row = {
            "batch": bs, "decode_ms_per_step": round(per_step * 1000, 2),
            "tokens_per_s": round(bs / per_step, 1),
            "kv_dtype": args.kv_dtype, "model": args.model_path,
        }
        rows.append(row)
        print(json.dumps(row))

    if args.output_csv:
        os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
        with open(args.output_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()
