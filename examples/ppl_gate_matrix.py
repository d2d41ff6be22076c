"""Full-pipeline accuracy-gate matrix (VERDICT r2 item 6).

For each quantization config (fp16 / mix8 / mix4 / quik) the driver runs
the WHOLE production pipeline on a llama-style random model with
engineered activation outliers:

    build fp weights -> calibrate -> quantize -> save_checkpoint ->
    load_checkpoint -> CB-serve sanity generation -> sliding-window PPL
    (bf16 KV and int8 KV)

and emits one JSON row per (config, kv_dtype) with the PPL delta vs the
fp16 baseline — the committed analogue of the reference's central W8A8O16
"within 0.1 of FP16 Wikitext2 PPL" gate (perplexity_utils.py:101-212,
BASELINE.md) including the int8-KV serving default question (is int8 KV
accuracy-safe?). Real Llama weights don't exist in this environment; the
day they do, `evalppl.py --model_path <hf_dir>` is the same gate in one
command.

  python examples/ppl_gate_matrix.py --preset halfb --output PPL_GATE.json
  python examples/ppl_gate_matrix.py --preset tiny --platform cpu   # smoke

presets: tiny (CI-size), mid (~120M), halfb (~0.8B — 7B-like shapes,
16 layers; needs the TPU chip or patience).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "tiny": dict(hidden_size=128, intermediate_size=256,
                 num_hidden_layers=3, num_attention_heads=8,
                 num_key_value_heads=4, vocab_size=512),
    "mid": dict(hidden_size=1024, intermediate_size=2752,
                num_hidden_layers=8, num_attention_heads=16,
                num_key_value_heads=16, vocab_size=8192),
    "halfb": dict(hidden_size=2048, intermediate_size=5504,
                  num_hidden_layers=16, num_attention_heads=16,
                  num_key_value_heads=16, vocab_size=32000),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mid", choices=sorted(PRESETS))
    ap.add_argument("--n_ctx", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--eval_tokens", type=int, default=8192)
    ap.add_argument("--output", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--ckpt_dir", default="/tmp/ppl_gate_ckpt")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from mixq_tpu.config import EngineConfig, ModelConfig, QuantConfig
    from mixq_tpu.engine.batching import ContinuousBatchingEngine
    from mixq_tpu.eval import compute_perplexity
    from mixq_tpu.models import DecoderSpecs
    from mixq_tpu.models.hf import params_from_source
    from mixq_tpu.quantize import (load_checkpoint, quantize_model,
                                   resolve_specs, save_checkpoint)
    from mixq_tpu.utils.testing import DictSource, random_hf_state

    cfg = ModelConfig(**PRESETS[args.preset])
    n_out = max(3, cfg.hidden_size // 40)
    rng = np.random.RandomState(11)
    out_ch = rng.choice(cfg.hidden_size, n_out, replace=False)
    print(f"# building {args.preset} model "
          f"(H={cfg.hidden_size} L={cfg.num_hidden_layers} "
          f"V={cfg.vocab_size}, {n_out} engineered outlier channels)",
          flush=True)
    src = DictSource(random_hf_state(cfg, seed=7, outlier_channels=out_ch))
    eval_tokens = rng.randint(0, cfg.vocab_size, args.eval_tokens)
    calib = [rng.randint(1, cfg.vocab_size, (4, 128)) for _ in range(2)]

    configs = {
        "fp16": None,
        "mix8": QuantConfig.w8a8(),
        "mix4": QuantConfig.w4a4(),
        # grouped W4: per-group scales cut 4-bit weight error; rides the
        # packed mix_gemm path at per-channel speed. 64 divides every
        # preset's hidden AND intermediate dim (mid's 2752 bars 128)
        "mix4_g64": QuantConfig.w4a4(q_group_size=64),
        # FULL W4 (VERDICT r3 item 4): drop the reference's 8-bit-only
        # policy for down/o (module.py:2) so every linear goes 4-bit —
        # the full weight-byte reduction; grouped scales are the accuracy
        # insurance for the dropped policy
        "mix4_full_g64": QuantConfig.w4a4(q_group_size=64,
                                          eightbit_only_names=()),
        "quik": QuantConfig.quik_w4a4(),
    }
    rows, ppl_fp = [], {}
    for name, qcfg in configs.items():
        t0 = time.time()
        if qcfg is None:
            specs = DecoderSpecs.fp16()
            params = params_from_source(src, cfg, specs)
        else:
            qparams, specs = quantize_model(src, cfg, qcfg,
                                            calib_batches=calib)
            ck = os.path.join(args.ckpt_dir, name)
            save_checkpoint(ck, qparams, cfg, qcfg)
            del qparams
            params, cfg2, q2 = load_checkpoint(ck)
            specs = resolve_specs(q2)
        # CB-serve sanity: the loaded checkpoint must serve
        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16))
        rid = eng.add_request([1, 2, 3, 4], 8)
        served = eng.run_to_completion()[rid]
        assert len(served) == 8, served
        del eng

        for kv in ("bfloat16", "int8"):
            r = compute_perplexity(
                params, cfg, eval_tokens, specs, n_ctx=args.n_ctx,
                batch_size=args.batch, kv_dtype=jnp.dtype(kv),
                max_windows=args.windows)
            row = {"config": name, "kv": kv, "ppl": round(r.ppl, 4),
                   "windows": r.n_windows, "n_ctx": args.n_ctx,
                   "preset": args.preset,
                   "seconds": round(time.time() - t0, 1)}
            if name == "fp16":
                ppl_fp[kv] = r.ppl
            if "bfloat16" in ppl_fp:
                base = ppl_fp["bfloat16"]
                row["delta_vs_fp16"] = round(r.ppl - base, 4)
                row["rel_delta_pct"] = round(100 * (r.ppl - base) / base, 3)
            rows.append(row)
            print(json.dumps(row), flush=True)
        del params

    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"# wrote {args.output}", flush=True)


if __name__ == "__main__":
    main()
