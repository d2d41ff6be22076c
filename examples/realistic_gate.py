"""Realistic-substrate accuracy campaign (VERDICT r3 item 3a/3b).

Replaces the random-weight PPL gate's noise-level evidence with a TRAINED
substrate (mixq_tpu/utils/substrate.py): a tiny LM trained on a synthetic
language until PPL is far below chance, then injected with
function-preserving outlier channels. On this substrate quantization
damage is a signal, not noise:

  1. online-predictor convergence — quantize WITHOUT calibration (empty
     outlier sets), run the sigma=6 warmup lifecycle on corpus batches,
     assert the planted channels are discovered (reference lifecycle
     linear.py:200-227, Cache.py:6-22);
  2. multi-seed PPL-gate matrix — PPL per config on K disjoint held-out
     corpus segments -> mean +/- std; the gate asserts fp16 <= mix8 <=
     mix4 MONOTONE with the mix4 gap outside the noise band (the failure
     mode VERDICT r3 weak #5 called out: one-seed random-weight deltas
     can hide real damage).

  python examples/realistic_gate.py --output PPL_GATE_R04.json
  python examples/realistic_gate.py --steps 120 --segments 2   # smoke

Artifacts cache under --cache_dir so re-runs skip the CPU training.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=("tiny", "mid"))
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--train_batch", type=int, default=16)
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--corpus_tokens", type=int, default=200_000)
    ap.add_argument("--segments", type=int, default=4,
                    help="disjoint held-out eval segments (noise band)")
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--n_ctx", type=int, default=128)
    ap.add_argument("--gain", type=float, default=8.0)
    ap.add_argument("--n_outliers", type=int, default=6)
    ap.add_argument("--output", default=None)
    ap.add_argument("--cache_dir", default="/tmp/realistic_substrate")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")   # sitecustomize overrides env
    import jax.numpy as jnp
    import numpy as np

    from mixq_tpu.config import QuantConfig
    from mixq_tpu.eval import compute_perplexity
    from mixq_tpu.models import DecoderSpecs
    from mixq_tpu.models.hf import params_from_source
    from mixq_tpu.quantize import quantize_model, resolve_specs
    from mixq_tpu.quantize.online import warmup_online_outliers
    from mixq_tpu.utils.substrate import (
        hf_state_from_params, plant_outlier_channels, substrate_cfg,
        synth_corpus, train_tiny_lm,
    )
    from mixq_tpu.utils.testing import DictSource

    cfg = substrate_cfg(args.preset)
    corpus = synth_corpus(cfg.vocab_size, args.corpus_tokens, seed=0)
    # held-out: SAME language (phrase book seed 0), fresh emission stream
    held_out = synth_corpus(cfg.vocab_size, args.segments * args.windows
                            * args.n_ctx + 16, seed=0, sample_seed=1)

    ck = os.path.join(
        args.cache_dir,
        f"{args.preset}_s{args.steps}_b{args.train_batch}_t{args.seq_len}.npz")
    if os.path.exists(ck):
        print(f"# cached substrate {ck}", flush=True)
        state = dict(np.load(ck))
    else:
        t0 = time.time()
        params, loss = train_tiny_lm(
            cfg, corpus, steps=args.steps, batch=args.train_batch,
            seq_len=args.seq_len, log_every=100)
        print(f"# trained {args.steps} steps in {time.time()-t0:.0f}s, "
              f"loss {loss:.3f} (chance {np.log(cfg.vocab_size):.3f})",
              flush=True)
        state = hf_state_from_params(params, cfg)
        os.makedirs(args.cache_dir, exist_ok=True)
        np.savez(ck, **state)

    rng = np.random.RandomState(3)
    planted = np.sort(rng.choice(cfg.hidden_size, args.n_outliers,
                                 replace=False))
    inner = np.sort(rng.choice(cfg.intermediate_size, args.n_outliers,
                               replace=False))
    # fp function preservation check: logits before/after planting
    probe = jnp.asarray(corpus[:64][None].astype(np.int32))
    fp_specs = DecoderSpecs.fp16()

    def fp_logits(st):
        from mixq_tpu.models import KVCache

        p = params_from_source(DictSource(st), cfg, fp_specs)
        cache = KVCache.create(cfg.num_hidden_layers, 1, 64,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        from mixq_tpu.models.decoder import forward

        return np.asarray(forward(p, probe, cache, fp_specs, cfg)[0])

    base_logits = fp_logits(state)
    state = plant_outlier_channels(
        {k: v.copy() for k, v in state.items()}, cfg, planted,
        gain=args.gain, inner_channels=inner)
    planted_logits = fp_logits(state)
    drift = float(np.max(np.abs(planted_logits - base_logits))
                  / (np.max(np.abs(base_logits)) + 1e-9))
    print(json.dumps({"check": "plant_function_preserving",
                      "max_rel_logit_drift": round(drift, 6)}), flush=True)
    assert drift < 0.02, "outlier planting changed the fp function"

    src = DictSource(state)
    rows = [{"check": "plant_function_preserving", "drift": drift,
             "planted": planted.tolist(), "inner": inner.tolist()}]

    # ---- (3b) online-predictor convergence on the planted substrate ----
    qcfg = QuantConfig.w8a8(outlier_budget=32)
    qparams, specs = quantize_model(src, cfg, qcfg)   # NO calibration:
    # outlier sets start empty; the sigma=6 online lifecycle must find the
    # planted channels from the activations alone
    warm = [corpus[i * 4096:(i * 4096) + 4 * 64].reshape(4, 64)
            for i in range(2)]
    qparams, counts = warmup_online_outliers(
        qparams, cfg, specs, warm, sigma=qcfg.outlier_sigma,
        max_steps=qcfg.warmup_steps)
    hits, misses = {}, {}
    for i, bp in enumerate(qparams.blocks):
        found = set(np.asarray(bp.attn.wq.out_ind)[
            np.asarray(bp.attn.wq.out_mask) > 0].tolist())
        hit = sum(1 for c in planted if int(c) in found)
        hits[i] = hit
        if hit < len(planted):
            misses[i] = sorted(set(map(int, planted)) - found)
    row = {"check": "online_predictor_convergence",
           "planted": len(planted), "per_layer_hits": hits,
           "misses": misses, "counts_sample": dict(list(counts.items())[:6])}
    rows.append(row)
    print(json.dumps(row), flush=True)

    # ---- (3a) multi-seed PPL-gate matrix ----
    calib = [corpus[-(i + 1) * 2048:][:512].reshape(4, 128) for i in range(2)]
    configs = {
        "fp16": None,
        "mix8": QuantConfig.w8a8(),
        "mix4": QuantConfig.w4a4(),
        "mix4_g64": QuantConfig.w4a4(q_group_size=64),
        "mix4_full_g64": QuantConfig.w4a4(q_group_size=64,
                                          eightbit_only_names=()),
        "quik": QuantConfig.quik_w4a4(),
    }
    seg_len = args.windows * args.n_ctx
    seg_ppls = {}              # (config, kv) -> [ppl per segment]
    for name, q in configs.items():
        t0 = time.time()
        if q is None:
            specs = fp_specs
            params = params_from_source(src, cfg, specs)
        else:
            params, specs = quantize_model(src, cfg, q, calib_batches=calib)
        for kv in ("bfloat16", "int8"):
            ppls = []
            for s in range(args.segments):
                seg = held_out[s * seg_len:(s + 1) * seg_len + 1]
                r = compute_perplexity(
                    params, cfg, seg, specs, n_ctx=args.n_ctx,
                    batch_size=8, kv_dtype=jnp.dtype(kv),
                    max_windows=args.windows)
                ppls.append(r.ppl)
            seg_ppls[(name, kv)] = ppls
            mean, std = float(np.mean(ppls)), float(np.std(ppls))
            row = {"config": name, "kv": kv, "ppl_mean": round(mean, 4),
                   "ppl_std": round(std, 4), "segments": args.segments,
                   "windows": args.windows, "preset": args.preset,
                   "seconds": round(time.time() - t0, 1)}
            base = seg_ppls.get(("fp16", "bfloat16"))
            if base:
                # PAIRED per-segment deltas: segment difficulty is shared
                # across configs, so pairing removes it from the noise band
                # (an unpaired band of absolute-PPL std is orders of
                # magnitude too loose — it hid everything in r3)
                d = np.asarray(ppls) - np.asarray(base)
                row["delta_vs_fp16"] = round(float(d.mean()), 4)
                row["delta_std_paired"] = round(float(d.std()), 4)
                row["rel_delta_pct"] = round(
                    100 * float(d.mean()) / float(np.mean(base)), 3)
            rows.append(row)
            print(json.dumps(row), flush=True)
        del params

    # the monotone-separation gate (VERDICT weak #5 fix): quant damage must
    # ORDER the configs, with gaps judged against the PAIRED noise band
    def paired(name):
        d = (np.asarray(seg_ppls[(name, "bfloat16")])
             - np.asarray(seg_ppls[("fp16", "bfloat16")]))
        # the claim is about the MEAN paired delta over n segments ->
        # the band is 2 standard errors, not 2 stds of a single segment
        return float(d.mean()), float(d.std() / np.sqrt(len(d)))

    d8, s8 = paired("mix8")
    d4, s4 = paired("mix4")
    band = 2.0 * max(s8, s4, 1e-9)
    fp = float(np.mean(seg_ppls[("fp16", "bfloat16")]))
    gate = {"check": "monotone_separation",
            "fp16_ppl": round(fp, 4),
            "mix8_delta": round(d8, 4), "mix4_delta": round(d4, 4),
            "paired_band_2se": round(band, 4),
            "monotone": bool(d8 <= d4 + band and -band <= d8),
            "mix4_gap_significant": bool(d4 > band)}
    rows.append(gate)
    print(json.dumps(gate), flush=True)

    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=1, default=str)
        print(f"# wrote {args.output}", flush=True)


if __name__ == "__main__":
    main()
