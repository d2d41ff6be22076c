#!/bin/bash
# One-command hardware measurement session for when the TPU relay is
# reachable. Ordered by value-per-minute; each step has its own timeout so
# a wedged point cannot eat the session. Artifacts land in the repo root.
#
#   bash scripts/hw_sweep.sh            # full session (~45-60 min)
#   bash scripts/hw_sweep.sh quick      # matrix only (~20 min)
set -u
cd "$(dirname "$0")/.."
MODE=${1:-full}

echo "=== 0. relay reachability (fail fast) ==="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "relay unreachable; aborting"; exit 3; }

echo "=== 1. decode-throughput matrix -> BENCH_MATRIX.jsonl ==="
bash scripts/bench_matrix.sh BENCH_MATRIX.jsonl

[ "$MODE" = quick ] && exit 0

echo "=== 2. attention microbench: new kernel paths vs XLA ==="
# int8, long-KV shape (the flash regime); window + alibi variants
timeout 900 env MB_B=256 MB_S=128 MB_KV=int8 \
  MB_IMPLS=flash,flash_win,flash_alibi,xla,xla_win,xla_alibi \
  python examples/attn_microbench.py | tee MICROBENCH_WIN_ALIBI.jsonl
# tail + head-grid split sanity at big n_kv (the fixed shadowing path)
timeout 900 env MB_B=64 MB_S=1024 MB_KV=int8 MB_HBLK=8 \
  MB_IMPLS=flash,flash_dma,xla python examples/attn_microbench.py \
  | tee MICROBENCH_S1024.jsonl

echo "=== 3. latency percentiles (TTFT + p50/p95/p99) ==="
timeout 1200 env BENCH_BATCH=64 BENCH_SEQ=256 BENCH_PROMPT=128 \
  BENCH_DECODE_STEPS=64 BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_CSV=LATENCY_r02.csv python benchlatency.py \
  && tail -2 LATENCY_r02.csv

echo "=== 4. in-model probe: flash vs xla at 1-layer 7B ==="
timeout 1200 env PROBE_CONFIGS=flash:128:int8,xla_int8:128:int8,xla:128:bfloat16 \
  python examples/decode_probe.py || echo "probe failed (non-fatal)"

echo "=== 5. serving throughput (CB pool, 7B) ==="
timeout 1800 env BENCH_PRESET=7b BENCH_SLOTS=64 BENCH_REQUESTS=128 \
  BENCH_PROMPT_MAX=128 BENCH_NEW_MAX=128 BENCH_SEQ=256 BENCH_KV=int8 \
  BENCH_WARMUP=1 python benchserve.py | tee SERVE_r02.json

echo "=== done; artifacts: BENCH_MATRIX.jsonl MICROBENCH_*.jsonl LATENCY_r02.csv SERVE_r02.json ==="
