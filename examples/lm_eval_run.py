"""EleutherAI lm-evaluation-harness runner (reference examples/eval.py +
utils/lm_eval_adaptor.py). Loads a mixq_tpu quantized checkpoint, wraps it
in MixQLM, and runs lm_eval.simple_evaluate.

  python examples/lm_eval_run.py --model_path <dir> --tasks lambada_openai \
      [--batch_size 8] [--max_length 2048] [--limit 100] [--output out.json]

Requires lm-eval to be installed (`pip install lm-eval`); errors cleanly
otherwise — the adaptor itself (mixq_tpu/eval/lm_eval_adaptor.py) and its
span-scoring math are covered by tests/test_lm_eval.py without the harness.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--tokenizer_path", default=None)
    ap.add_argument("--tasks", required=True,
                    help="comma-separated lm-eval task names")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_length", type=int, default=2048)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--output", default=None, help="write results JSON here")
    args = ap.parse_args()

    try:
        import lm_eval
    except ImportError:
        sys.exit("lm_eval is not installed; pip install lm-eval to run the "
                 "harness (the MixQLM adaptor itself has no harness "
                 "dependency and is tested standalone)")

    from transformers import AutoTokenizer

    from mixq_tpu.eval.lm_eval_adaptor import MixQLM
    from mixq_tpu.models.auto import AutoModel

    tok = AutoTokenizer.from_pretrained(args.tokenizer_path or args.model_path)
    params, cfg, specs = AutoModel.from_quantized(args.model_path)
    lm = MixQLM(params, cfg, specs, tok,
                batch_size=args.batch_size, max_length=args.max_length)

    results = lm_eval.simple_evaluate(
        model=lm, tasks=args.tasks.split(","), limit=args.limit)
    print(json.dumps(results.get("results", results), indent=2, default=str))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2, default=str)


if __name__ == "__main__":
    main()
