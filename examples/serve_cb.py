"""Continuous-batching serving driver: drain a JSONL request file through
the slot-pool engine, emitting completions as they finish.

The reference has no serving runtime (one static generate() call,
benchflops.py:82-133); this is the L4 driver for the serving layer this
framework adds on top of it.

  python examples/serve_cb.py --model_path <dir> --requests reqs.jsonl
      [--slots 8 --max_seq 2048 --kv_dtype int8 --warmup]

Request lines: {"prompt": "...", "max_new_tokens": 64,
                "temperature": 0.8, "top_k": 40, "top_p": 0.95,
                "stop_token_ids": [ints]}
("prompt_ids": [ints] may replace "prompt" — no tokenizer needed; all
other fields optional; sampling fields default to greedy).
Output lines: {"id": N, "text"/"token_ids": ..., "tokens": M,
               "steps_waited": K} (+ "logprobs" with --logprobs)
"""
import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--tokenizer_path", default=None,
                    help="defaults to model_path; optional when every "
                         "request carries prompt_ids")
    ap.add_argument("--requests", required=True,
                    help="JSONL request file ('-' for stdin)")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max_seq", type=int, default=2048)
    ap.add_argument("--kv_dtype", default="bfloat16")
    ap.add_argument("--max_new_tokens", type=int, default=64,
                    help="default budget for requests without one")
    ap.add_argument("--eos_token_id", type=int, default=None)
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile the serving program set first")
    ap.add_argument("--spec_k", type=int, default=0,
                    help=">1: speculative serving (device spec window — "
                         "greedy rows draft prompt-lookup n-grams on "
                         "device, bit-identical output, fewer forwards)")
    ap.add_argument("--spec_ngram", type=int, default=3)
    ap.add_argument("--logprobs", action="store_true",
                    help="include per-token logprobs in output records")
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    from mixq_tpu.config import EngineConfig
    from mixq_tpu.engine.sampling import SamplingParams
    from mixq_tpu.models.auto import AutoModel

    tok = None
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(
            args.tokenizer_path or args.model_path)
    except Exception as e:                                # prompt_ids mode
        print(f"no tokenizer ({e}); expecting prompt_ids requests",
              file=sys.stderr)
    eos = args.eos_token_id
    if eos is None and tok is not None:
        eos = tok.eos_token_id
    eng = AutoModel.serving_engine(
        args.model_path,
        EngineConfig(max_batch_size=args.slots, max_seq_len=args.max_seq,
                     kv_dtype=args.kv_dtype, spec_k=args.spec_k,
                     spec_ngram=args.spec_ngram))
    if args.warmup:
        n = eng.warmup()
        print(f"warmup: {n} programs compiled", file=sys.stderr)

    src = sys.stdin if args.requests == "-" else open(args.requests)
    out = sys.stdout if args.out == "-" else open(args.out, "w")

    submit_step = {}       # rid -> window index at submission
    step = 0

    def drain(block: bool):
        nonlocal step
        while eng.has_work:
            if args.spec_k > 1:
                eng.step_spec_window(eos_token_id=eos)
            else:
                eng.step_window(eos_token_id=eos)
            step += 1
            for rid, r in eng.finished_records().items():
                ids = r["tokens"]
                rec = {"id": rid, "tokens": len(ids),
                       "steps_waited": step - submit_step.pop(rid)}
                if tok is not None:
                    rec["text"] = tok.decode(ids)
                else:
                    rec["token_ids"] = ids
                if args.logprobs:
                    rec["logprobs"] = [round(x, 4) for x in r["logprobs"]]
                print(json.dumps(rec), file=out, flush=True)
            if not block:
                return

    for line in src:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if "prompt_ids" in req:
                ids = req["prompt_ids"]
            elif tok is not None:
                ids = tok(req["prompt"]).input_ids
            else:
                raise ValueError(
                    "text prompt but no tokenizer loaded; send prompt_ids")
        except Exception as e:
            # reject the one bad request; in-flight completions keep going
            print(json.dumps({"error": f"{type(e).__name__}: {e}",
                              "request": line[:200]}), file=out, flush=True)
            continue
        sp = None
        if any(k in req for k in ("temperature", "top_k", "top_p")):
            sp = SamplingParams(temperature=req.get("temperature", 0.0),
                                top_k=req.get("top_k", 0),
                                top_p=req.get("top_p", 1.0))
        rid = eng.add_request(
            ids, req.get("max_new_tokens", args.max_new_tokens),
            sampling=sp, stop_token_ids=req.get("stop_token_ids"))
        submit_step[rid] = step
        drain(block=False)   # overlap serving with request ingestion
    drain(block=True)
    stats = eng.stats()
    print(f"served {stats['finished']} requests in {step} windows",
          file=sys.stderr)


if __name__ == "__main__":
    main()
