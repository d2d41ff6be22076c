"""7B-shape accuracy gate ON HARDWARE (VERDICT r4 item 6).

The r4 PPL gate validated quantization damage ordering (fp16 < mix8 <
mix4) on a trained 4-layer toy — but quantization error ACCUMULATES over
depth, and the 32-layer 7B shape had only throughput rows. This driver
puts a paired-delta PPL matrix on the full 7B shape using the
Markov-readout substrate (utils/substrate.py::make_markov_state) with a
SENSITIVITY-CALIBRATED margin:

  * the planted successor chain gives every token a known argmax with a
    tunable logit margin; --margin sets the operating point so fp16 NLL
    is small but finite and block-noise perturbations move it smoothly
    (margin 30, the serving default, sits at PPL 1.0 — numb to damage);
  * --block_scale sets how much the 32 random decoder blocks contribute
    to the residual stream: their int8/int4 weight quantization noise is
    exactly the accumulated-over-depth damage the gate must detect;
  * planted outlier channels (plant_outlier_channels, applied ONCE to
    the shared block — share_blocks aliases every layer) give the
    mixed-precision outlier machinery real |x| > sigma channels to keep.

Rows: {fp16, mix8, mix4, quik} x {bfloat16, int8 KV}, PPL per held-out
chain segment, PAIRED deltas vs fp16 (same segments), and the monotone-
separation gate — the realistic_gate.py contract at 32-layer depth.

  python examples/gate_7b.py --output PPL_GATE_R05_7b.json          # chip
  python examples/gate_7b.py --layers 3 --platform cpu --hidden 256 # smoke

Reference methodology: real-activation evaluation
(/root/reference/examples/benchbitsand.py:32-34) and the central
"W8A8O16 within ~0.1 of FP16 PPL" claim (BASELINE.md).
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=0,
                    help="0 = full 7B shape; smaller for CPU smoke")
    ap.add_argument("--margin", type=float, default=7.0)
    ap.add_argument("--block_scale", type=float, default=2e-3)
    ap.add_argument("--v_eff", type=int, default=512)
    ap.add_argument("--n_outliers", type=int, default=6)
    ap.add_argument("--gain", type=float, default=8.0)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--n_ctx", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--configs", default="fp16,mix8,mix4,quik")
    ap.add_argument("--kv", default="bfloat16,int8")
    ap.add_argument("--output", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from bench import llama2_7b_cfg
    from mixq_tpu.config import ModelConfig, QuantConfig
    from mixq_tpu.eval import compute_perplexity
    from mixq_tpu.models import DecoderSpecs, KVCache
    from mixq_tpu.models.decoder import forward
    from mixq_tpu.models.hf import params_from_source
    from mixq_tpu.quantize import quantize_model
    from mixq_tpu.utils.substrate import (make_markov_state,
                                          plant_outlier_channels)
    from mixq_tpu.utils.testing import DictSource

    if args.hidden:
        cfg = ModelConfig(
            model_type="llama", vocab_size=2048, hidden_size=args.hidden,
            intermediate_size=args.hidden * 11008 // 4096,
            num_hidden_layers=args.layers,
            num_attention_heads=max(args.hidden // 128, 2),
            num_key_value_heads=max(args.hidden // 128, 2),
            max_position_embeddings=2048)
    else:
        cfg = llama2_7b_cfg(args.layers)
    v_eff = min(args.v_eff, cfg.vocab_size, cfg.hidden_size)

    t0 = time.time()
    state, succ = make_markov_state(
        cfg, v_eff=v_eff, seed=0, margin=args.margin,
        block_scale=args.block_scale, mean_cycle=48, share_blocks=True)
    print(f"# substrate built in {time.time()-t0:.0f}s "
          f"(margin {args.margin}, block_scale {args.block_scale})",
          flush=True)

    # plant outlier channels ONCE on the shared block (every layer
    # aliases the same arrays; a per-layer loop would compound the gain
    # 32x) — norm gains and consumer columns stay function-preserving
    rng = np.random.RandomState(3)
    planted = np.sort(rng.choice(cfg.hidden_size, args.n_outliers,
                                 replace=False))
    inner = np.sort(rng.choice(cfg.intermediate_size, args.n_outliers,
                               replace=False))
    fp_specs = DecoderSpecs.fp16()

    def walk(start, n):
        out = [int(start)]
        for _ in range(n - 1):
            out.append(int(succ[out[-1]]))
        return out

    probe_tokens = np.asarray(walk(2, 64), np.int32)[None]

    def fp_logits(st):
        p = params_from_source(DictSource(st), cfg, fp_specs)
        cache = KVCache.create(cfg.num_hidden_layers, 1, 64,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        out = np.asarray(
            forward(p, jnp.asarray(probe_tokens), cache, fp_specs,
                    cfg)[0][:, :, :v_eff], np.float32)
        del p
        return out

    base_logits = fp_logits(state)
    cfg1 = dataclasses.replace(cfg, num_hidden_layers=1)
    state = plant_outlier_channels(state, cfg1, planted, gain=args.gain,
                                   inner_channels=inner)
    planted_logits = fp_logits(state)
    drift = float(np.max(np.abs(planted_logits - base_logits))
                  / (np.max(np.abs(base_logits)) + 1e-9))
    rows = [{"check": "plant_function_preserving",
             "max_rel_logit_drift": round(drift, 6),
             "planted": planted.tolist(), "layers": cfg.num_hidden_layers,
             "margin": args.margin, "block_scale": args.block_scale}]
    print(json.dumps(rows[0]), flush=True)

    src = DictSource(state)
    # calibration and held-out text: chain walks from disjoint starts
    calib = [np.asarray(walk(3 + i, 512), np.int32).reshape(4, 128)
             for i in range(2)]
    seg_len = args.windows * args.n_ctx
    starts = [11 + 7 * s for s in range(args.segments)]
    segments = [np.asarray(walk(st, seg_len + 1), np.int32)
                for st in starts]

    qconfigs = {
        "fp16": None,
        "mix8": QuantConfig.w8a8(),
        "mix4": QuantConfig.w4a4(),
        "quik": QuantConfig.quik_w4a4(),
    }
    want = args.configs.split(",")
    kvs = args.kv.split(",")
    seg_ppls = {}
    for name in want:
        q = qconfigs[name]
        t0 = time.time()
        if q is None:
            specs = fp_specs
            params = params_from_source(src, cfg, specs)
        else:
            params, specs = quantize_model(src, cfg, q, calib_batches=calib)
        params = jax.device_put(params)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
        print(f"# {name}: params ready {time.time()-t0:.0f}s", flush=True)
        for kv in kvs:
            t1 = time.time()
            ppls = []
            for seg in segments:
                r = compute_perplexity(
                    params, cfg, seg, specs, n_ctx=args.n_ctx,
                    batch_size=args.batch, kv_dtype=jnp.dtype(kv),
                    max_windows=args.windows)
                ppls.append(r.ppl)
            seg_ppls[(name, kv)] = ppls
            row = {"config": name, "kv": kv,
                   "ppl_mean": round(float(np.mean(ppls)), 5),
                   "ppl_std": round(float(np.std(ppls)), 5),
                   "segments": args.segments, "preset": "7b",
                   "layers": cfg.num_hidden_layers,
                   "seconds": round(time.time() - t1, 1)}
            base = seg_ppls.get(("fp16", kvs[0]))
            if base:
                d = np.asarray(ppls) - np.asarray(base)
                row["delta_vs_fp16"] = round(float(d.mean()), 5)
                row["delta_se_paired"] = round(
                    float(d.std() / np.sqrt(len(d))), 5)
                row["rel_delta_pct"] = round(
                    100 * float(d.mean()) / float(np.mean(base)), 4)
            rows.append(row)
            print(json.dumps(row), flush=True)
        del params

    def paired(name):
        d = (np.asarray(seg_ppls[(name, kvs[0])])
             - np.asarray(seg_ppls[("fp16", kvs[0])]))
        return float(d.mean()), float(d.std() / np.sqrt(len(d)))

    if "mix8" in want and "mix4" in want:
        d8, s8 = paired("mix8")
        d4, s4 = paired("mix4")
        band = 2.0 * max(s8, s4, 1e-9)
        gate = {"check": "monotone_separation_7b",
                "fp16_ppl": round(float(np.mean(
                    seg_ppls[("fp16", kvs[0])])), 5),
                "mix8_delta": round(d8, 5), "mix4_delta": round(d4, 5),
                "paired_band_2se": round(band, 5),
                "monotone": bool(d8 <= d4 + band and -band <= d8),
                "mix4_gap_significant": bool(d4 > band),
                "layers": cfg.num_hidden_layers}
        rows.append(gate)
        print(json.dumps(gate), flush=True)

    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=1, default=str)
        print(f"# wrote {args.output}", flush=True)


if __name__ == "__main__":
    main()
