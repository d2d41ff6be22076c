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
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--tokenizer_path", default=None)
    ap.add_argument("--tasks", default=None,
                    help="comma-separated lm-eval task names")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_length", type=int, default=2048)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--output", default=None, help="write results JSON here")
    ap.add_argument("--offline_task", default=None,
                    choices=("synth_cloze", "synth_completion", "all"),
                    help="vendored offline task (eval/offline_tasks.py) "
                         "driven through the adaptor's harness interface — "
                         "needs no lm-eval install. Uses --model_path if "
                         "given, else the in-tree Markov substrate.")
    args = ap.parse_args()

    if args.offline_task:
        return run_offline(args)
    if not args.model_path or not args.tasks:
        sys.exit("--model_path and --tasks are required (or use "
                 "--offline_task)")

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


def run_offline(args):
    """Vendored-task mode: the same MixQLM request/response interface the
    external harness drives, no lm-eval install needed."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mixq_tpu.eval.lm_eval_adaptor import MixQLM
    from mixq_tpu.eval.offline_tasks import (
        IntTokenizer, build_cloze_task, build_completion_task,
        evaluate_cloze, evaluate_completion,
    )

    if args.model_path:
        from mixq_tpu.models.auto import AutoModel

        params, cfg, specs = AutoModel.from_quantized(args.model_path)
        from mixq_tpu.utils.substrate import synth_corpus

        corpus = synth_corpus(cfg.vocab_size, 8192, seed=0, sample_seed=2)
    else:
        from mixq_tpu.config import ModelConfig
        from mixq_tpu.models import DecoderSpecs
        from mixq_tpu.models.hf import params_from_source
        from mixq_tpu.utils.substrate import make_markov_state
        from mixq_tpu.utils.testing import DictSource

        cfg = ModelConfig(model_type="llama", vocab_size=512,
                          hidden_size=256, intermediate_size=704,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=4)
        state, succ = make_markov_state(cfg, v_eff=128, seed=0,
                                        mean_cycle=12)
        specs = DecoderSpecs.fp16()
        params = params_from_source(DictSource(state), cfg, specs)
        walk = [5]
        for _ in range(2000):
            walk.append(int(succ[walk[-1]]))
        corpus = np.asarray(walk, np.int32)

    lm = MixQLM(params, cfg, specs, IntTokenizer(),
                batch_size=args.batch_size,
                max_length=min(args.max_length, 128))
    results = []
    n = args.limit or 32
    if args.offline_task in ("synth_cloze", "all"):
        results.append(evaluate_cloze(
            lm, build_cloze_task(corpus, n_items=n, ctx_len=12, cont_len=3)))
    if args.offline_task in ("synth_completion", "all"):
        results.append(evaluate_completion(
            lm, build_completion_task(corpus, n_items=max(n // 2, 4),
                                      ctx_len=12, gen_len=3)))
    for r in results:
        print(json.dumps(r))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
