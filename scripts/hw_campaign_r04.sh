#!/bin/bash
# Round-4 hardware campaign (runs after bench_ab_r04.sh drains):
#  1. latency matrix with device/transport split  -> LATENCY_R04.csv
#  2. 7B CB capacity slots sweep (the chunked-prefill OOM fix)
#                                                  -> SERVE_CAP_R04.jsonl
#  3. 7B Markov-substrate speculative serving A/B  -> SERVE_SPEC_R04.jsonl
set -u
cd "$(dirname "$0")/.."

# wait for the A/B series to release the chip (wait only — never kill)
while pgrep -f bench_ab_r04.sh > /dev/null; do sleep 60; done

echo "=== stage 1: latency matrix ==="
timeout 5400 python examples/latency_matrix.py 2> lat_r04.log

echo "=== stage 2: capacity slots sweep ==="
: > SERVE_CAP_R04.jsonl
cap() {
  local tag=$1; shift
  local line
  line=$(timeout 3600 env "$@" python benchserve.py 2>> serve_cap_r04.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> SERVE_CAP_R04.jsonl
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> SERVE_CAP_R04.jsonl
  fi
}
# capacity mode: saturated pool (burst admissions), int8 KV serving default
CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto BENCH_SEQ=256 \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=64 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0"
cap cap_slots32 $CAPENV BENCH_SLOTS=32 BENCH_REQUESTS=128
cap cap_slots64 $CAPENV BENCH_SLOTS=64 BENCH_REQUESTS=256
cap cap_slots96 $CAPENV BENCH_SLOTS=96 BENCH_REQUESTS=256

echo "=== stage 3: markov speculative serving (7B shapes) ==="
: > SERVE_SPEC_R04.jsonl
spec() {
  local tag=$1; shift
  local line
  line=$(timeout 3600 env "$@" python benchserve.py 2>> serve_spec_r04.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> SERVE_SPEC_R04.jsonl
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> SERVE_SPEC_R04.jsonl
  fi
}
# spec_k>1 needs the batch-major cache (xla attend); saturated pool;
# chain-walk prompts with wrapping cycles -> real nonzero acceptance
SPECENV="BENCH_PRESET=7b BENCH_SUBSTRATE=markov BENCH_MARKOV_CYCLE=16 \
  BENCH_KV=int8 BENCH_ATTN=xla BENCH_SEQ=256 BENCH_SLOTS=32 \
  BENCH_REQUESTS=96 BENCH_ARRIVAL_BURST=32 BENCH_ARRIVAL_P=1 \
  BENCH_PROMPT_MAX=48 BENCH_NEW_MAX=64"
spec markov_plain    $SPECENV BENCH_SPEC_K=0
spec markov_adaptive $SPECENV BENCH_SPEC_K=4 BENCH_SPEC_MODE=adaptive
spec markov_forced   $SPECENV BENCH_SPEC_K=4 BENCH_SPEC_MODE=window

echo "=== campaign done ==="
cat LATENCY_R04.csv 2>/dev/null
cat SERVE_CAP_R04.jsonl SERVE_SPEC_R04.jsonl 2>/dev/null
