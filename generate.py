"""Text generation CLI (reference generate.py / examples/basic_generate.py).

  python generate.py --model_path <dir> --prompt "..." [--max_new_tokens 64]
      [--temperature 0.8 --top_k 40 --top_p 0.95]
"""
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--tokenizer_path", default=None,
                    help="defaults to model_path")
    ap.add_argument("--prompt", default="Hello, my name is", nargs="+")
    ap.add_argument("--max_new_tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top_k", type=int, default=0)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max_seq", type=int, default=2048)
    ap.add_argument("--kv_dtype", default="bfloat16")
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from mixq_tpu.config import EngineConfig
    from mixq_tpu.engine import InferenceEngine, SamplingParams
    from mixq_tpu.models.auto import AutoModel

    tok = AutoTokenizer.from_pretrained(args.tokenizer_path or args.model_path)
    engine = AutoModel.engine(
        args.model_path,
        EngineConfig(max_seq_len=args.max_seq, kv_dtype=args.kv_dtype))

    prompts = [args.prompt] if isinstance(args.prompt, str) else args.prompt
    prompt_ids = [tok(p).input_ids for p in prompts]
    out = engine.generate(
        prompt_ids, max_new_tokens=args.max_new_tokens,
        sampling=SamplingParams(temperature=args.temperature,
                                top_k=args.top_k, top_p=args.top_p),
        seed=args.seed, eos_token_id=tok.eos_token_id)
    for p, o in zip(prompts, out):
        print(f"=== {p!r}\n{tok.decode(o)}\n")


if __name__ == "__main__":
    main()
