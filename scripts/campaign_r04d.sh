#!/bin/bash
# Round-4 campaign, fourth leg: async (lag-1 pipelined) decode windows
# on the capacity config. r04c measured slots=128 @ max_seq=128 at
# 2,353.1 tok/s sync with device-time/wall-time ~102/129 ms per window
# (LATENCY_R04 hint) — the sync loop idles the chip for one fetch RTT +
# host bookkeeping every window. step_window_async dispatches window N+1
# from device-carried (tok, lengths) before fetching window N, hiding
# that gap. Target: >= 2,700 tok/s (VERDICT r3 item 2).
# Requires the r04-async branch merged. ONE process on the chip at a time.
set -u
cd "$(dirname "$0")/.."

row() {
  local out=$1 tag=$2 prog=$3; shift 3
  local line
  line=$(timeout 3600 env "$@" python "$prog" 2>> campaign_r04d.log | tail -1)
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

echo "=== stage: async capacity (slots=128 @ max_seq=128) ===" >&2
row SERVE_CAP_R04.jsonl cap_slots128_s128_async benchserve.py \
  $CAPENV BENCH_ASYNC=1
row SERVE_CAP_R04.jsonl cap_slots128_s128_async_r16 benchserve.py \
  $CAPENV BENCH_ASYNC=1 BENCH_WINDOW_R=16
# sync control at R=16: separates window-length amortization from the
# async overlap itself
row SERVE_CAP_R04.jsonl cap_slots128_s128_sync_r16 benchserve.py \
  $CAPENV BENCH_WINDOW_R=16

echo "=== campaign_r04d done ===" >&2
