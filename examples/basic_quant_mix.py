"""Offline MIX quantization CLI (reference examples/basic_quant_mix.py:13-37).

  python examples/basic_quant_mix.py --model_path <hf_dir> \
      --quant_file <out_dir> --w_bit 8 [--a_bit 8] [--outlier_budget 128] \
      [--calib_tokens tokens.npy | --calib_text file.txt]
"""
import argparse
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True, help="HF checkpoint dir")
    ap.add_argument("--quant_file", required=True, help="output dir")
    ap.add_argument("--w_bit", type=int, default=8, choices=(4, 8))
    ap.add_argument("--a_bit", type=int, default=None)
    ap.add_argument("--version", default="MIX", choices=("MIX", "QUIK",
                                                         "WEIGHT_ONLY"))
    ap.add_argument("--outlier_budget", type=int, default=None)
    ap.add_argument("--calib_tokens", default=None, help=".npy token stream")
    ap.add_argument("--calib_text", default=None)
    ap.add_argument("--calib_samples", type=int, default=64)
    args = ap.parse_args()

    from mixq_tpu.config import QuantConfig
    from mixq_tpu.models.auto import AutoModel
    from mixq_tpu.models.hf import load_hf_config
    from mixq_tpu.quantize import save_checkpoint
    from mixq_tpu.utils.calib_data import get_calib_dataset

    budget = args.outlier_budget or (128 if args.version == "MIX" else 256)
    qcfg = QuantConfig(
        w_bit=args.w_bit, a_bit=args.a_bit or args.w_bit,
        version=args.version, outlier_budget=budget)

    calib = None
    if args.w_bit <= 4 or args.version == "QUIK":
        cfg = load_hf_config(args.model_path)
        tokenizer = None
        if args.calib_text:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(args.model_path)
        calib = get_calib_dataset(
            text_path=args.calib_text, tokenizer=tokenizer,
            tokens_path=args.calib_tokens, n_samples=args.calib_samples,
            vocab_size=cfg.vocab_size)

    params, cfg, specs = AutoModel.from_pretrained(
        args.model_path, quant_config=qcfg, calib_batches=calib)
    save_checkpoint(args.quant_file, params, cfg, qcfg)
    print(f"quantized {args.model_path} -> {args.quant_file} "
          f"(W{qcfg.w_bit}A{qcfg.a_bit} {qcfg.version}, "
          f"outlier budget {qcfg.outlier_budget})")


if __name__ == "__main__":
    main()
