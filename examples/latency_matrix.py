"""Decode-latency matrix with a device/transport split (VERDICT r3 item 6).

r3's latency evidence was one row whose p99 was 27x its p50 — almost
certainly relay scheduling, but the harness couldn't prove it because it
subtracted a constant. This harness makes the split measurable:

  * each WINDOW is ONE dispatch: a jitted lax.scan of R dependent decode
    steps ending in a device fetch. Device work per window is static-shaped
    and identical, so window-to-window variance in wall time is transport,
    not the chip.
  * the pure device window cost comes from the chain-difference discipline
    (time N windows vs 2N windows chained with ONE final fetch; the
    difference cancels dispatch+fetch constants — CLAUDE.md).
  * reported per config: device_ms_per_step (chain), wall p50/p90/p99 of
    individual window dispatches, transport_p50 = wall_p50 - device_window,
    and the device-attributable p99 (device_window + (wall_p99 - wall_p50)
    is an upper bound on device tail; with static shapes the honest claim
    is device tail ~ 0 and the whole spread is transport).

Writes LATENCY_R04.csv. Env: LAT_CONFIGS="B:S:kv:attn[:mode],...", LAT_R
(8), LAT_WINDOWS (40), LAT_LAYERS (32). The optional 5th field selects an
ENGINE-mode row: "asyncN" (lag-1 step_window_async with window_r=N — the
shipped capacity mode) or "specN" (device spec window, spec_k=N). Engine
rows drive a full ContinuousBatchingEngine pool (slots=B) with every slot
occupied and report the same wall percentiles per dispatch; their device
window cost is the matching plain row's (identical program shape), and
async completion latency adds exactly one window of lag by construction
(completions observed one window late — test_async_window.py).

Reference scaffold being replaced: benchlatency.py's per-step-sync design
(reference benchlatency.py, 302 lines) — meaningless through a relay that
doesn't block on block_until_ready.
"""
import csv
import functools
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
if os.environ.get("LAT_PLATFORM"):
    # the axon sitecustomize registers the TPU backend in every process
    # and wins over JAX_PLATFORMS; a CPU smoke must force it here or it
    # silently contends for the shared chip
    jax.config.update("jax_platforms", os.environ["LAT_PLATFORM"])
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import llama2_7b_cfg as _7b_cfg, tiny_cfg as _tiny_cfg

# LAT_PRESET=tiny: CPU smoke of the harness itself (CI-size model)
llama2_7b_cfg = (_tiny_cfg if os.environ.get("LAT_PRESET") == "tiny"
                 else _7b_cfg)
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.ops.pallas.flash_decode import use_head_major_cache

R = int(os.environ.get("LAT_R", "8"))
N_WIN = int(os.environ.get("LAT_WINDOWS", "40"))
L = int(os.environ.get("LAT_LAYERS", "32"))
CONFIGS = os.environ.get(
    "LAT_CONFIGS",
    "32:256:int8:flash,32:256:bfloat16:xla,"
    "128:128:int8:flash,128:128:bfloat16:xla,512:32:bfloat16:xla",
).split(",")
OUT = os.environ.get("LAT_OUT", "LATENCY_R04.csv")


def build(B, S, kv, attn):
    import dataclasses

    cfg = llama2_7b_cfg(L)
    specs = dataclasses.replace(
        DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8)), attn_impl=attn)
    params = jax.device_put(init_decoder_params(
        jax.random.PRNGKey(0), cfg, specs, dtype=jnp.bfloat16))
    jax.block_until_ready(params)
    hm = use_head_major_cache(attn, cfg, S, jnp.dtype(kv).itemsize)
    # one-dispatch window: R dependent steps in a lax.scan + (head-major)
    # the end-of-window tail flush — the same program shape the serving
    # engine's step_window dispatches, so window latency here IS serving
    # window latency
    cache0 = KVCache.create(L, B, S, cfg.num_key_value_heads, cfg.head_dim_,
                            jnp.dtype(kv), head_major=hm,
                            tail_r=R if hm else 0)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def window(params, tok, cache):
        def body(carry, _):
            tok, cache = carry
            logits, cache = forward(params, tok[:, None], cache, specs, cfg)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache), ()

        (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=R)
        if cache.k_tail is not None:
            cache = cache.flush_tail()
        return tok, cache

    return params, window, cache0


def engine_mode_row(spec, B, S, kv, attn, mode):
    """Per-dispatch wall latency of an ENGINE window mode (async / spec)
    on a fully-occupied CB pool. Device window cost is the matching
    plain row's (same program shape); this row measures the dispatch
    cadence the serving loop actually experiences in that mode."""
    import dataclasses
    import random

    from mixq_tpu.config import EngineConfig
    from mixq_tpu.engine.batching import ContinuousBatchingEngine

    cfg = llama2_7b_cfg(L)
    dspecs = dataclasses.replace(
        DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8)), attn_impl=attn)
    params = jax.device_put(init_decoder_params(
        jax.random.PRNGKey(0), cfg, dspecs, dtype=jnp.bfloat16))
    jax.block_until_ready(params)

    is_async = mode.startswith("async")
    is_spec = mode.startswith("spec")
    num = int(mode[5 if is_async else 4:] or 0) if (is_async or is_spec) \
        else 0
    ecfg = EngineConfig(
        max_batch_size=B, max_seq_len=S, prefill_chunk=32, kv_dtype=kv,
        window_r=num if is_async else 0,
        async_windows=is_async, spec_k=num if is_spec else 0,
        fold_flush=os.environ.get("LAT_FOLD_FLUSH", "1") == "1")
    eng = ContinuousBatchingEngine(params, cfg, dspecs, ecfg)
    rng = random.Random(0)
    # fill every slot with a budget long enough to stay active through
    # the whole measurement (windows * R tokens each)
    budget = (N_WIN + 4) * max(num, 8) * (ecfg.spec_k or 1)
    for _ in range(B):
        eng.add_request([rng.randrange(2, 60) for _ in range(8)],
                        min(budget, S - 16))
    step = (eng.step_window_async if is_async
            else eng.step_spec_window if is_spec else eng.step_window)
    t0 = time.time()
    step()                                   # compile + first dispatch
    compile_s = time.time() - t0
    print(f"# {spec}: first window {compile_s:.0f}s", file=sys.stderr,
          flush=True)
    walls = []
    for _ in range(N_WIN):
        t0 = time.time()
        step()
        walls.append((time.time() - t0) * 1e3)
    walls = np.asarray(walls)
    r_eff = num if num else R
    return {
        "config": spec, "B": B, "S": S, "kv": kv, "attn": attn, "R": r_eff,
        "device_ms_per_window": "",       # see the matching plain row
        "device_ms_per_step": "",
        "device_tokens_per_s": "",
        "wall_p50_ms": round(float(np.percentile(walls, 50)), 2),
        "wall_p90_ms": round(float(np.percentile(walls, 90)), 2),
        "wall_p99_ms": round(float(np.percentile(walls, 99)), 2),
        "transport_p50_ms": "",
        "transport_spread_p99_p50_ms": round(
            float(np.percentile(walls, 99) - np.percentile(walls, 50)), 2),
        "n_windows": N_WIN,
    }


def main():
    if len(CONFIGS) > 1 and os.environ.get("LAT_SUBPROC", "1") == "1":
        # one config per PROCESS: HBM holds ~9GB of params+cache per 7B
        # config and python frames keep the previous config's buffers
        # alive into the next build (measured: every config after the
        # first died RESOURCE_EXHAUSTED). The persistent compile cache
        # makes the re-init cheap.
        import subprocess

        rows = []
        for i, spec in enumerate(CONFIGS):
            env = dict(os.environ, LAT_CONFIGS=spec,
                       LAT_OUT=f"/tmp/lat_row_{i}.csv", LAT_SUBPROC="0")
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=3600)
            try:
                with open(f"/tmp/lat_row_{i}.csv") as f:
                    lines = f.read().strip().split("\n")
                if len(lines) >= 2:
                    rows.append(dict(zip(lines[0].split(","),
                                         lines[1].split(","))))
            except FileNotFoundError:
                print(json.dumps({"config": spec, "error":
                                  f"subprocess rc={r.returncode}"}),
                      flush=True)
        if rows:
            with open(OUT, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0]))
                w.writeheader()
                w.writerows(rows)
            print(f"# wrote {OUT} ({len(rows)} rows)", flush=True)
        return

    rows = []
    for spec in CONFIGS:
        parts = spec.split(":")
        B, S, kv, attn = parts[:4]
        B, S = int(B), int(S)
        mode = parts[4] if len(parts) > 4 else ""
        if mode:
            try:
                row = engine_mode_row(spec, B, S, kv, attn, mode)
                rows.append(row)
                print(json.dumps(row), flush=True)
            except Exception as e:                         # noqa: BLE001
                print(json.dumps({"config": spec,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
            continue
        t0 = time.time()
        try:
            params, window, cache = build(B, S, kv, attn)
            tok = jnp.ones((B,), jnp.int32)
            tok, cache = window(params, tok, cache)       # compile
            _ = jax.device_get(tok)
        except Exception as e:                             # noqa: BLE001
            print(json.dumps({"config": spec,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        print(f"# {spec}: compile {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)

        # device window cost: chained windows, one fetch, two lengths
        def chain(n, tok, cache):
            t0 = time.time()
            for _ in range(n):
                tok, cache = window(params, tok, cache)
            _ = jax.device_get(tok)
            return time.time() - t0, tok, cache

        _, tok, cache = chain(2, tok, cache)
        t1, tok, cache = chain(4, tok, cache)
        t2, tok, cache = chain(8, tok, cache)
        dev_window_ms = max((t2 - t1) / 4, 1e-9) * 1e3

        # individual window dispatches: static device work, so the wall
        # spread is transport
        walls = []
        for _ in range(N_WIN):
            t0 = time.time()
            tok, cache = window(params, tok, cache)
            _ = jax.device_get(tok)
            walls.append((time.time() - t0) * 1e3)
        walls = np.asarray(walls)
        row = {
            "config": spec, "B": B, "S": S, "kv": kv, "attn": attn, "R": R,
            "device_ms_per_window": round(dev_window_ms, 3),
            "device_ms_per_step": round(dev_window_ms / R, 3),
            "device_tokens_per_s": round(B * R / (dev_window_ms / 1e3), 1),
            "wall_p50_ms": round(float(np.percentile(walls, 50)), 2),
            "wall_p90_ms": round(float(np.percentile(walls, 90)), 2),
            "wall_p99_ms": round(float(np.percentile(walls, 99)), 2),
            "transport_p50_ms": round(
                float(np.percentile(walls, 50)) - dev_window_ms, 2),
            "transport_spread_p99_p50_ms": round(
                float(np.percentile(walls, 99) - np.percentile(walls, 50)),
                2),
            "n_windows": N_WIN,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if rows:
        with open(OUT, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"# wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
