#!/bin/bash
# Round-4 campaign remainder (the first run was cut by the session limit):
#   1. capacity slots=96 (32/64 landed: 1,080 / 1,764.7 tok/s)
#   2. 7B Markov-substrate speculative serving A/B -> SERVE_SPEC_R04.jsonl
#   3. latency-matrix rows beyond the one that landed  -> LATENCY_R04.csv
# Serialized: ONE process on the chip at a time.
set -u
cd "$(dirname "$0")/.."

row() {
  local out=$1 tag=$2; shift 2
  local line
  line=$(timeout 3600 env "$@" python benchserve.py 2>> campaign_r04b.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$out"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$out"
  fi
  echo "=== $tag done ===" >&2
}

CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto BENCH_SEQ=256 \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=64 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0"
row SERVE_CAP_R04.jsonl cap_slots96 $CAPENV BENCH_SLOTS=96 BENCH_REQUESTS=256

SPECENV="BENCH_PRESET=7b BENCH_SUBSTRATE=markov BENCH_MARKOV_CYCLE=16 \
  BENCH_KV=int8 BENCH_ATTN=xla BENCH_SEQ=256 BENCH_SLOTS=32 \
  BENCH_REQUESTS=96 BENCH_ARRIVAL_BURST=32 BENCH_ARRIVAL_P=1 \
  BENCH_PROMPT_MAX=48 BENCH_NEW_MAX=64"
row SERVE_SPEC_R04.jsonl markov_plain    $SPECENV BENCH_SPEC_K=0
row SERVE_SPEC_R04.jsonl markov_adaptive $SPECENV BENCH_SPEC_K=4 BENCH_SPEC_MODE=adaptive
row SERVE_SPEC_R04.jsonl markov_forced   $SPECENV BENCH_SPEC_K=4 BENCH_SPEC_MODE=window

# latency rows that did not land in the first run (32:256:int8:flash did)
LAT_CONFIGS="32:256:bfloat16:xla,128:128:int8:flash,128:128:bfloat16:xla,512:32:bfloat16:xla,512:32:int8:flash" \
  LAT_OUT=LATENCY_R04b.csv timeout 7200 python examples/latency_matrix.py \
  2>> campaign_r04b.log
echo "=== campaign_r04b done ===" >&2
