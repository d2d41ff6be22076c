#!/bin/bash
# Round-4 campaign, final leg — priority-ordered for the remaining round
# wall-clock (replaces r04c stages 3-4, which ran lowest-value-first):
#   1. async-window capacity rows (VERDICT item 2's 2,700 tok/s target;
#      r04c measured sync slots=128@128 = 2,353.1 with ~27ms/window of
#      host+transport idle that step_window_async overlaps)
#   2. full-W4 B=32 bench trio (VERDICT item 4's missing bench rows)
#   3. latency matrix, remaining configs (VERDICT item 6 needs >= 4 rows;
#      32:256:int8:flash is already in LATENCY_R04.csv from r04b) —
#      runs last because per-config rows land in /tmp/lat_row_*.csv and
#      are recoverable even if the round ends mid-matrix.
# ONE process on the chip at a time.
set -u
cd "$(dirname "$0")/.."

row() {
  local out=$1 tag=$2 prog=$3; shift 3
  local line
  line=$(timeout 3600 env "$@" python "$prog" 2>> campaign_r04e.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$out"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$out"
  fi
  echo "=== $tag done $(date +%H:%M:%S) ===" >&2
}

CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0 BENCH_SEQ=128 BENCH_SLOTS=128 \
  BENCH_REQUESTS=512"

echo "=== stage 1: async capacity (slots=128 @ max_seq=128) ===" >&2
row SERVE_CAP_R04.jsonl cap_slots128_s128_async benchserve.py \
  $CAPENV BENCH_ASYNC=1
row SERVE_CAP_R04.jsonl cap_slots128_s128_async_r16 benchserve.py \
  $CAPENV BENCH_ASYNC=1 BENCH_WINDOW_R=16
# sync control at R=16: separates window-length amortization from the
# async overlap itself
row SERVE_CAP_R04.jsonl cap_slots128_s128_sync_r16 benchserve.py \
  $CAPENV BENCH_WINDOW_R=16

echo "=== stage 2: full-W4 at B=32 ===" >&2
B32="BENCH_BATCH=32 BENCH_SEQ=32 BENCH_KV=bfloat16 BENCH_ATTN=xla"
row BENCH_AB_r04.jsonl w8_b32          bench.py $B32
row BENCH_AB_r04.jsonl w4_b32          bench.py BENCH_W=4 $B32
row BENCH_AB_r04.jsonl w4_full_g64_b32 bench.py BENCH_W=4 BENCH_FULLW4=1 BENCH_GROUP=64 $B32

echo "=== stage 3: latency matrix (remaining configs; rows also land" >&2
echo "    per-config in /tmp/lat_row_*.csv) ===" >&2
LAT_CONFIGS="32:256:int8:flash,32:256:bfloat16:xla,128:128:int8:flash,128:128:bfloat16:xla,512:32:bfloat16:xla,512:32:int8:flash" \
  timeout 14400 python examples/latency_matrix.py 2>> campaign_r04e.log
echo "=== latency done $(date +%H:%M:%S) ===" >&2

echo "=== campaign_r04e done ===" >&2
