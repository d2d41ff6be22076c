#!/bin/bash
# Round-5 campaign, leg B4: locate the W4 capacity frontier + name the
# binding buffer. Leg B3 proved the W4 unlock (96@256: 1,772.6 tok/s —
# the r3 OOM shape's FIRST measured row) but 192@128 W4 still dies at
# runtime despite identical pool+weight bytes as 96@256 — the residual
# scaling term is per-SLOT buffers (async tail copies). These rows
# bracket the wall and the memprobe prints the per-program accounting.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05b4.log

row() {
  local out=$1 tag=$2 tmo=$3 prog=$4; shift 4
  local line attempt
  for attempt in 1 2; do
    line=$(timeout "$tmo" env "$@" python "$prog" 2>> "$LOG" | tail -1)
    if [ -n "$line" ]; then
      echo "{\"tag\": \"$tag\", \"attempt\": $attempt, ${line:1}" >> "$out"
      echo "=== $tag done (attempt $attempt) $(date +%H:%M:%S) ===" >&2
      return
    fi
    echo "=== $tag attempt $attempt failed $(date +%H:%M:%S) ===" >&2
  done
  echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash-x2\"}" >> "$out"
}

CAP=SERVE_CAP_R05.jsonl
CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0 BENCH_ASYNC=1 BENCH_WINDOW_R=16 \
  BENCH_FOLD_FLUSH=0"

# AOT accounting at the failing shape (compile-only, fast — init fits)
row $CAP memprobe_slots192_w4 2400 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_MEMPROBE=1
# frontier bracket between 128 (passes) and 192 (fails)
row $CAP cap_slots160_s128_w4 4800 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=160 BENCH_REQUESTS=640
# async holds an extra in-flight tail set (the slot-scaled suspect);
# sync mode drops it — if 192 W4 fits sync, the binder is named by
# elimination as well as by the memprobe
row $CAP cap_slots192_s128_w4_sync 4800 benchserve.py \
  BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto BENCH_ARRIVAL_BURST=64 \
  BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 BENCH_NEW_MAX=64 BENCH_WARMUP=0 \
  BENCH_WINDOW_R=16 BENCH_FOLD_FLUSH=0 \
  BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_REQUESTS=768

echo "=== campaign_r05b4 done $(date +%H:%M:%S) ===" >&2
