#!/bin/bash
# Round-5 campaign, leg B3: the capacity frontier attacked on its real
# axis. Leg B's unfolded flush killed the 3.0G relayout temp (program
# temps now 800M) but slots>=192 @128 and 96@256 still die: a RUNTIME
# ResourceExhausted on the first window fetch — the ARGUMENT footprint
# (weights ~7.2G + pool) leaves no workspace headroom. Packed W4 weights
# (~3.4G) buy back ~3.3G, which is exactly a 192->320-slot pool worth of
# int8 KV; these rows measure what that unlocks, plus the R sweep at the
# known-good shape (VERDICT r5 item 2's "sweep R at the best slots").
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05b3.log

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

echo "=== stage 1: W4 capacity unlocks ===" >&2
row $CAP cap_slots192_s128_w4 4800 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_REQUESTS=768
row $CAP cap_slots256_s128_w4 4800 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=256 BENCH_REQUESTS=1024
row $CAP cap_slots96_s256_w4 4800 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=256 BENCH_SLOTS=96 BENCH_REQUESTS=384
# W4 price at the known-good shape (W8 control: 2,701 unfolded)
row $CAP cap_slots128_s128_w4 4800 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=128 BENCH_REQUESTS=512

echo "=== stage 2: R sweep + W8 wall location ===" >&2
row $CAP cap_slots128_s128_async_r24 4800 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=128 BENCH_REQUESTS=512 \
  BENCH_WINDOW_R=24
row $CAP cap_slots160_s128_w8 4800 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=160 BENCH_REQUESTS=640

echo "=== campaign_r05b3 done $(date +%H:%M:%S) ===" >&2
