"""Serving benchmark: continuous-batching throughput + per-request latency
under randomized arrivals.

The reference has no serving runtime, so it has no serving benchmark; this
is the CB-engine counterpart of benchflops.py (static-batch decode). A
synthetic request stream (geometric inter-arrival gaps, randomized prompt
lengths and budgets) drains through the windowed slot pool; the harness
reports aggregate generated-token throughput plus per-request queueing and
completion latencies measured in decode WINDOWS (the engine's scheduling
quantum — wall-clock per window is also reported, so window counts convert
to seconds).

Prints ONE JSON line. Env knobs:
  BENCH_PRESET (tiny|7b, default tiny)  BENCH_SLOTS (default 8)
  BENCH_REQUESTS (default 32)           BENCH_ARRIVAL_P (default 0.5 —
      per-window probability a queued request is submitted)
  BENCH_PROMPT_MAX (default 64)         BENCH_NEW_MAX (default 64)
  BENCH_SEQ (max_seq, default 256)      BENCH_KV (bfloat16|int8)
  BENCH_ATTN (auto|flash|xla)           BENCH_WARMUP (1: pre-compile)
  BENCH_SPEC_K (default 0 — >1 serves speculatively: greedy rows draft
      prompt-lookup n-grams and emit their accepted prefix; reports
      acceptance + emitted/forward. Default path is the DEVICE spec
      window (spec_window_r verify rounds per dispatch, on-device
      drafting); BENCH_SPEC_HOST=1 forces the host-loop step_spec)
"""
import json
import os
import random
import sys
import time

import jax

# BENCH_FORCE_CPU=1: run on host CPU. The env's sitecustomize registers
# the TPU relay backend in EVERY process and overrides JAX_PLATFORMS, so
# a config.update after import is the only way to keep a smoke run off
# the (shared, single) chip while a campaign is draining on it.
if os.environ.get("BENCH_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import numpy as np

from bench import llama2_7b_cfg, tiny_cfg
from mixq_tpu.config import EngineConfig
from mixq_tpu.engine.batching import ContinuousBatchingEngine
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec


def main():
    preset = os.environ.get("BENCH_PRESET", "tiny")
    n_slots = int(os.environ.get("BENCH_SLOTS", "8"))
    n_req = int(os.environ.get("BENCH_REQUESTS", "32"))
    arrival_p = float(os.environ.get("BENCH_ARRIVAL_P", "0.5"))
    prompt_max = int(os.environ.get("BENCH_PROMPT_MAX", "64"))
    new_max = int(os.environ.get("BENCH_NEW_MAX", "64"))
    max_seq = int(os.environ.get("BENCH_SEQ", "256"))
    kv = os.environ.get("BENCH_KV", "bfloat16")
    attn = os.environ.get("BENCH_ATTN", "auto")
    spec_k = int(os.environ.get("BENCH_SPEC_K", "0"))
    spec_ngram = int(os.environ.get("BENCH_SPEC_NGRAM", "3"))
    n_layers = int(os.environ.get("BENCH_LAYERS",
                                  "32" if preset == "7b" else "2"))

    cfg = llama2_7b_cfg(n_layers) if preset == "7b" else tiny_cfg(n_layers)
    import dataclasses

    # BENCH_W=4: packed W4 (reference 8-bit-down/o policy, bench.py's
    # spec block) — halves the weight-argument footprint (~6.7G -> ~3.8G
    # at 7B), which is what bounds the slot-pool capacity frontier
    # (PROFILE_r05 §2.1: slots>=192 @128 OOMs on ARGUMENTS, not temps)
    w_bits = int(os.environ.get("BENCH_W", "8"))
    if w_bits == 4:
        from mixq_tpu.config import QuantConfig
        from mixq_tpu.quantize import resolve_specs

        base_specs = resolve_specs(QuantConfig.w4a4())
    else:
        base_specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    specs = dataclasses.replace(base_specs, attn_impl=attn)
    t0 = time.time()
    # BENCH_SUBSTRATE=markov: a planted-Markov-chain readout at full model
    # shapes (utils/substrate.py) — generations follow deterministic token
    # cycles, so the n-gram drafter gets the repetition real text has.
    # Random weights never accept a draft (SERVE_SPEC_r03 drafted=0); this
    # substrate is the honest way to measure speculation's WIN side.
    substrate = os.environ.get("BENCH_SUBSTRATE", "random")
    succ = None
    if substrate == "markov":
        from mixq_tpu.config import QuantConfig
        from mixq_tpu.quantize import quantize_model
        from mixq_tpu.utils.substrate import make_markov_state
        from mixq_tpu.utils.testing import DictSource

        # short cycles wrap within a prompt, giving the n-gram drafter
        # history to match (a cycle must recur before lookup can fire)
        state, succ = make_markov_state(
            cfg, v_eff=min(512, cfg.vocab_size, cfg.hidden_size), seed=0,
            mean_cycle=int(os.environ.get("BENCH_MARKOV_CYCLE", "16")),
            share_blocks=True)
        params, qspecs = quantize_model(
            DictSource(state), cfg,
            QuantConfig.w4a4() if w_bits == 4 else QuantConfig.w8a8())
        del state
        specs = dataclasses.replace(qspecs, attn_impl=attn)
    else:
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    # BENCH_ASYNC=1: lag-1 pipelined windows (step_window_async) — the
    # fetch round-trip + host bookkeeping overlap the next window's
    # device time. BENCH_WINDOW_R: decode steps per window dispatch.
    use_async = os.environ.get("BENCH_ASYNC", "0") == "1"
    window_r = int(os.environ.get("BENCH_WINDOW_R", "0"))
    # BENCH_FOLD_FLUSH=0: run the tail flush as its own dispatch instead
    # of folding it into the window program (EngineConfig.fold_flush —
    # the folded scatter+flash layout conflict costs a whole-cache
    # relayout temp that OOMs pools past 128 slots)
    fold_flush = os.environ.get("BENCH_FOLD_FLUSH", "1") == "1"
    # BENCH_SPEC_NOISE: per-draft-token corruption probability (the
    # acceptance-cost-curve instrument, EngineConfig.spec_draft_noise —
    # acceptance ~= 1 - noise with the markov substrate's full coverage)
    spec_noise = float(os.environ.get("BENCH_SPEC_NOISE", "0"))
    eng = ContinuousBatchingEngine(
        params, cfg, specs,
        EngineConfig(max_batch_size=n_slots, max_seq_len=max_seq,
                     prefill_chunk=32, kv_dtype=kv, spec_k=spec_k,
                     spec_ngram=spec_ngram, window_r=window_r,
                     async_windows=use_async, fold_flush=fold_flush,
                     spec_draft_noise=spec_noise))
    print(f"init {time.time()-t0:.1f}s slots={n_slots} kv={kv} attn={attn} "
          f"hm={eng.cache.head_major}", file=sys.stderr)
    if os.environ.get("BENCH_MEMPROBE", "0") == "1":
        # AOT memory accounting of the serving program set at THIS config
        # (PROFILE_r05 §2.2): per-program temp/args/out/alias bytes name
        # the buffer that binds the capacity frontier. Compile-only; one
        # prefill bucket + one admission group size (the campaign's).
        burst = int(os.environ.get("BENCH_ARRIVAL_BURST", "0")) or n_slots
        n = eng.warmup(prompt_buckets=[prompt_max],
                       group_sizes=[min(burst, n_slots)], analyze=True)
        print(json.dumps({"metric": "serve_memprobe", "value": n,
                          "unit": "programs", "slots": n_slots,
                          "kv": kv, "w": w_bits, "seq": max_seq}))
        return
    if os.environ.get("BENCH_WARMUP", "0") == "1":
        t0 = time.time()
        n = eng.warmup()
        print(f"warmup: {n} programs, {time.time()-t0:.1f}s",
              file=sys.stderr)

    rng = random.Random(0)
    # BENCH_VOCAB_CAP: draw prompt tokens from the first N ids only.
    # Full-vocab random prompts never repeat a trailing n-gram, so the
    # prompt-lookup drafter proposes NOTHING (measured drafted=0) — a cap
    # of ~64 makes n-grams recur the way natural text does, which is the
    # regime speculative decoding exists for.
    vocab_cap = int(os.environ.get("BENCH_VOCAB_CAP", "0")) or cfg.vocab_size
    vocab_cap = min(vocab_cap, cfg.vocab_size)
    if succ is not None:
        # markov substrate: prompts are chain walks, so generation
        # continues each prompt's cycle and the drafter's history matches
        def walk(start, n):
            out = [start]
            for _ in range(n - 1):
                out.append(int(succ[out[-1]]))
            return out

        pending = [(walk(rng.randrange(2, len(succ)),
                         rng.randint(4, prompt_max)),
                    rng.randint(1, new_max)) for _ in range(n_req)]
    else:
        pending = [([rng.randrange(1, vocab_cap) for _ in
                     range(rng.randint(1, prompt_max))],
                    rng.randint(1, new_max)) for _ in range(n_req)]
    submit_w = {}
    done_w = {}
    budgets = {}
    window = 0
    total_tokens = 0
    t_start = time.time()
    compile_windows = 0
    compile_time = 0.0

    # BENCH_ARRIVAL_BURST: max admissions per window (default 1 = the
    # randomized-arrival latency workload; raise it for a capacity row —
    # one-per-window starves a 32-slot pool to ~4 active rows, measured
    # 156.9 tok/s against a >1k tok/s full-pool rate)
    burst = int(os.environ.get("BENCH_ARRIVAL_BURST", "1"))
    while pending or eng.has_work:
        admitted = 0
        while (pending and admitted < burst
               and (not eng.has_work or rng.random() < arrival_p)):
            p, b = pending.pop(0)
            rid = eng.add_request(p, b)
            submit_w[rid] = window
            budgets[rid] = b
            admitted += 1
        t_w = time.time()
        if spec_k > 1:
            # BENCH_SPEC_MODE: adaptive (default — spec windows while the
            # measured gain pays, plain fallback + re-probes otherwise),
            # window (force the device spec window), host (the host-loop
            # step_spec: one verify forward per relay round-trip, for A/B)
            mode = os.environ.get("BENCH_SPEC_MODE", "adaptive")
            if mode == "host" or os.environ.get("BENCH_SPEC_HOST") == "1":
                eng.step_spec()
            elif mode == "window":
                eng.step_spec_window()
            else:
                eng.step_serve()
        elif use_async:
            eng.step_window_async()
        else:
            eng.step_window()
        dt = time.time() - t_w
        if dt > 5.0:                    # compile window: exclude from rates
            compile_windows += 1
            compile_time += dt
        window += 1
        if dt > 5.0 or window % 10 == 0:
            # progress heartbeat: the markov_forced rows died to 3600s
            # timeouts twice in r4 with NO evidence of where time went
            # (VERDICT weak #6) — make the next stall attributable
            print(f"# w{window} {dt:.1f}s active={eng.sched.stats()} "
                  f"pending={len(pending)}", file=sys.stderr, flush=True)
        for rid, toks in eng.finished().items():
            done_w[rid] = window
            total_tokens += len(toks)
        if window > 200000:
            raise RuntimeError("serve bench did not drain")
    # exclude compile-dominated windows from the reported rates (a window
    # that takes >5s on these shapes is compiling, not serving)
    wall = time.time() - t_start - compile_time
    wall = max(wall, 1e-9)

    waits = [done_w[r] - submit_w[r] for r in done_w]
    ms_per_window = 1000.0 * wall / max(window - compile_windows, 1)
    out = {
        "metric": "cb_serving_throughput",
        "value": round(total_tokens / wall, 1),
        "unit": "tokens/s",
        "requests": len(done_w),
        "windows": window,
        "ms_per_window": round(ms_per_window, 2),
        "window_R": int(eng.cache.k_tail.shape[1])
        if eng.cache.k_tail is not None else eng._window_r,
        "async": use_async,
        "wait_windows_p50": float(np.percentile(waits, 50)),
        "wait_windows_p95": float(np.percentile(waits, 95)),
        "compile_windows": compile_windows,
        "slots": n_slots, "kv": kv, "attn": attn, "preset": preset,
        "w": w_bits,
    }
    if spec_k > 1:
        st = eng.spec_stats
        out["spec_k"] = spec_k
        out["spec_accept_rate"] = round(
            st["accepted"] / max(st["drafted"], 1), 3)
        out["spec_emitted_per_forward"] = round(
            st["emitted"] / max(st["forwards"], 1), 3)
        out["spec_forwards"] = st["forwards"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
