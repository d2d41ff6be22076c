#!/bin/bash
# Round-4 campaign, fifth leg: capacity with the tails-only scan carry.
# The whole-k-cache boundary copy (3.0G at 96@256) capped pools at
# slots=128 @ max_seq=128; with main k/v as loop invariants the copy
# should be gone, so bigger pools fit. async R=16 was the best measured
# mode at 128 slots (2,682 tok/s — PROFILE_r04 §5.2). Also retries the
# two latency-matrix configs that hit the intermittent remote_compile
# HTTP 500 (known relay flake — retry before concluding broken).
set -u
cd "$(dirname "$0")/.."

row() {
  local out=$1 tag=$2 prog=$3; shift 3
  local line
  line=$(timeout 3600 env "$@" python "$prog" 2>> campaign_r04f.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$out"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$out"
  fi
  echo "=== $tag done $(date +%H:%M:%S) ===" >&2
}

CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0 BENCH_SEQ=128 BENCH_ASYNC=1 \
  BENCH_WINDOW_R=16"

echo "=== stage 1: post-scanfix capacity ===" >&2
row SERVE_CAP_R04.jsonl cap_slots192_s128_async_r16 benchserve.py \
  $CAPENV BENCH_SLOTS=192 BENCH_REQUESTS=768
row SERVE_CAP_R04.jsonl cap_slots256_s128_async_r16 benchserve.py \
  $CAPENV BENCH_SLOTS=256 BENCH_REQUESTS=1024
# control: did the scanfix change the slots=128 number itself?
row SERVE_CAP_R04.jsonl cap_slots128_s128_async_r16_scanfix benchserve.py \
  $CAPENV BENCH_SLOTS=128 BENCH_REQUESTS=512

echo "=== stage 2: latency-matrix retries (relay compile flake) ===" >&2
LAT_CONFIGS="128:128:bfloat16:xla,512:32:bfloat16:xla" \
LAT_OUT=LATENCY_R04_RETRY.csv \
  timeout 7200 python examples/latency_matrix.py 2>> campaign_r04f.log
echo "=== latency retries done $(date +%H:%M:%S) ===" >&2

echo "=== campaign_r04f done ===" >&2
