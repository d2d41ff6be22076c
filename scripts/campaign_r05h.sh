#!/bin/bash
# Round-5 campaign, leg H: tail of leg G after skipping the markov_forced
# control (five attempts across r4/r5 all stall on the first forced
# dispatch — the failure is attributed in PROFILE_r05 §4.1; a sixth
# attempt buys nothing). Order: the 192-W4 layered-async row (does the
# layered flush actually rescue the shape the fused flush cannot
# compile? — the open §2.4 claim), then latency rows, then the gate
# probe.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05h.log

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

echo "=== stage 1: 192-W4 layered async $(date +%H:%M:%S) ===" >&2
row $CAP cap_slots192_s128_w4_layered 2400 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_REQUESTS=768 \
  MIXQ_FLUSH_LAYERED=1

echo "=== stage 2: latency engine-mode rows (item 5) $(date +%H:%M:%S) ===" >&2
for attempt in 1 2; do
  LAT_CONFIGS="128:128:bfloat16:xla,512:32:bfloat16:xla,32:256:int8:flash:async16,32:256:int8:flash:spec4" \
  LAT_OUT=LATENCY_R05.csv LAT_WINDOWS=20 \
    timeout 2400 python examples/latency_matrix.py 2>> "$LOG" && break
  echo "=== latency rows attempt $attempt failed ===" >&2
done

echo "=== stage 3: 7B gate probe (item 6) $(date +%H:%M:%S) ===" >&2
for attempt in 1 2; do
  timeout 1800 python examples/gate_7b.py --segments 2 --windows 4 \
    --configs fp16,mix4 --kv bfloat16 --block_scale 0.006 \
    --output GATE7B_PROBE_R05.json >> gate7b_probe.log 2>&1 && break
done

echo "=== campaign_r05h done $(date +%H:%M:%S) ===" >&2
