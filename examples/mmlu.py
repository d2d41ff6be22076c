"""MMLU accuracy CLI (reference examples/mmlu.py:519-662).

  python examples/mmlu.py --model_path <dir> --data_dir <hendrycks_data> \
      [--ntrain 5] [--check_accuracy --accuracy_threshold 0.3]
"""
import argparse
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--tokenizer_path", default=None)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--ntrain", type=int, default=5)
    ap.add_argument("--max_subjects", type=int, default=None)
    ap.add_argument("--max_questions", type=int, default=None)
    ap.add_argument("--max_seq", type=int, default=2048)
    ap.add_argument("--check_accuracy", action="store_true")
    ap.add_argument("--accuracy_threshold", type=float, default=0.3)
    args = ap.parse_args()

    import os

    from transformers import AutoTokenizer

    from mixq_tpu.eval.mmlu import evaluate_mmlu
    from mixq_tpu.models.auto import AutoModel

    tok = AutoTokenizer.from_pretrained(args.tokenizer_path or args.model_path)
    if os.path.exists(os.path.join(args.model_path, "manifest.json")):
        params, cfg, specs = AutoModel.from_quantized(args.model_path)
    else:
        params, cfg, specs = AutoModel.from_pretrained(args.model_path)

    result = evaluate_mmlu(
        params, cfg, specs, tok, args.data_dir, n_shot=args.ntrain,
        max_subjects=args.max_subjects,
        max_questions_per_subject=args.max_questions, max_seq=args.max_seq)

    print(json.dumps({
        "accuracy": round(result.accuracy, 4),
        "n_questions": result.n_questions,
        "per_subject": {k: round(v, 4) for k, v in result.per_subject.items()},
    }))
    if args.check_accuracy:
        # the reference's only quality assert (mmlu.py:660-661)
        assert result.accuracy >= args.accuracy_threshold, (
            f"accuracy {result.accuracy:.4f} < {args.accuracy_threshold}")


if __name__ == "__main__":
    main()
