"""Perplexity evaluation CLI (reference evalppl.py): Wikitext2-style sliding
PPL across backends (fp16 / mix8 / mix4 / quik) with CSV output.

  python evalppl.py --model_path <hf_dir or quantized_dir> \
      [--eval_tokens wiki.npy | --eval_text wiki.txt] \
      [--model_type fp16|mix8|mix4|quik] [--n_ctx 512] [--batch 8]
"""
import argparse
import csv
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--model_type", default="auto",
                    help="auto|fp16|mix8|mix4|quik (auto = whatever the "
                         "checkpoint is)")
    ap.add_argument("--eval_tokens", default=None, help=".npy token stream")
    ap.add_argument("--eval_text", default=None)
    ap.add_argument("--n_ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max_windows", type=int, default=None)
    ap.add_argument("--kv_dtype", default="bfloat16")
    ap.add_argument("--output_csv", default=None)
    ap.add_argument("--calib_tokens", default=None,
                    help=".npy token stream for 4-bit/QUIK calibration "
                         "(the reference calibrates on Pile, "
                         "utils/calib_data.py:6-45 — never the eval set)")
    ap.add_argument("--allow_eval_calib", action="store_true",
                    help="explicitly allow calibrating on the eval tokens "
                         "(leaks eval data into quantization; off by default)")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from mixq_tpu.config import QuantConfig
    from mixq_tpu.eval import compute_perplexity
    from mixq_tpu.models.auto import AutoModel
    from mixq_tpu.models.decoder import stack_decoder_params

    if args.eval_tokens:
        tokens = np.load(args.eval_tokens)
        bos = 1
    elif args.eval_text:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model_path)
        with open(args.eval_text, errors="ignore") as f:
            tokens = np.asarray(tok(f.read()).input_ids, np.int32)
        bos = tok.bos_token_id or 1
    else:
        raise SystemExit("need --eval_tokens or --eval_text")

    qcfg = {
        "fp16": None,
        "mix8": QuantConfig.w8a8(),
        "mix4": QuantConfig.w4a4(),
        "quik": QuantConfig.quik_w4a4(),
    }.get(args.model_type, "auto")

    if os.path.exists(os.path.join(args.model_path, "manifest.json")):
        params, cfg, specs = AutoModel.from_quantized(args.model_path)
    elif qcfg == "auto" or qcfg is None:
        params, cfg, specs = AutoModel.from_pretrained(args.model_path)
    else:
        from mixq_tpu.utils.calib_data import blocks_from_tokens
        if args.calib_tokens:
            calib_stream = np.load(args.calib_tokens)
        elif args.allow_eval_calib:
            calib_stream = tokens
        else:
            raise SystemExit(
                "quantizing at eval time needs --calib_tokens <pile.npy>; "
                "calibrating on the eval stream leaks eval data into the "
                "outlier selection (pass --allow_eval_calib to override)")
        calib = blocks_from_tokens(calib_stream, n_samples=16,
                                   block_len=min(512, args.n_ctx))
        params, cfg, specs = AutoModel.from_pretrained(
            args.model_path, quant_config=qcfg, calib_batches=calib)

    t0 = time.time()
    result = compute_perplexity(
        params, cfg, tokens, specs, n_ctx=args.n_ctx,
        batch_size=args.batch, bos_token_id=bos,
        kv_dtype=jnp.dtype(args.kv_dtype), max_windows=args.max_windows)
    dt = time.time() - t0

    row = {
        "model": args.model_path, "backend": args.model_type,
        "ppl": round(result.ppl, 4), "n_ctx": args.n_ctx,
        "windows": result.n_windows, "tokens": result.n_tokens,
        "seconds": round(dt, 1),
        "windows_per_s": round(result.n_windows / dt, 2),
    }
    print(json.dumps(row))
    if args.output_csv:
        os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
        exists = os.path.exists(args.output_csv)
        with open(args.output_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if not exists:
                w.writeheader()
            w.writerow(row)


if __name__ == "__main__":
    main()
