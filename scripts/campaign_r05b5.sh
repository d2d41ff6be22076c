#!/bin/bash
# Round-5 campaign, leg B5 (post-leg-C): the layered-flush rows.
# The memprobe named flush's whole-cache relayout temp (3.0G @192 W4)
# as the binding buffer; the layered flush caps it at 1/L. Two rows:
# (1) the 128-slot control under layered auto — the AUTO threshold (1G)
#     flips the control shape's program, so the knee number must be
#     re-measured before layered ships as default;
# (2) 192 W4 ASYNC — the shape the binder killed; layered + the B4
#     sync evidence should clear it.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05b5.log

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

row $CAP cap_slots128_s128_layered 4800 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=128 BENCH_REQUESTS=512 \
  MIXQ_FLUSH_LAYERED=1
row $CAP cap_slots192_s128_w4_layered 4800 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_REQUESTS=768 \
  MIXQ_FLUSH_LAYERED=1
# memprobe of the layered flush at the failing shape (temp must be ~1/L)
row $CAP memprobe_slots192_w4_layered 2400 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_MEMPROBE=1 \
  MIXQ_FLUSH_LAYERED=1

echo "=== campaign_r05b5 done $(date +%H:%M:%S) ===" >&2
