"""Calibration act-scale capture CLI
(reference examples/smooth_quant_get_act.py:165-177 -> act_scales/<model>.pt).

  python examples/get_act_scales.py --model_path <hf_dir> \
      --output act_scales/model.npz [--calib_tokens t.npy|--calib_text f.txt]
"""
import argparse
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--calib_tokens", default=None)
    ap.add_argument("--calib_text", default=None)
    ap.add_argument("--calib_samples", type=int, default=64)
    args = ap.parse_args()

    from mixq_tpu.models.auto import AutoModel
    from mixq_tpu.quantize import collect_act_scales, save_act_scales
    from mixq_tpu.utils.calib_data import get_calib_dataset

    params, cfg, specs = AutoModel.from_pretrained(args.model_path)
    tokenizer = None
    if args.calib_text:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    batches = get_calib_dataset(
        text_path=args.calib_text, tokenizer=tokenizer,
        tokens_path=args.calib_tokens, n_samples=args.calib_samples,
        vocab_size=cfg.vocab_size)
    scales = collect_act_scales(params, cfg, batches, specs)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    save_act_scales(scales, args.output)
    print(f"saved {len(scales)} act-scale vectors -> {args.output}")


if __name__ == "__main__":
    main()
