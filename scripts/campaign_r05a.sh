#!/bin/bash
# Round-5 campaign, leg A: the measurements r4 left as IOUs (VERDICT r5
# items 2, 4-control, 5). Every row gets its own `timeout` and ONE retry:
# the relay's remote_compile can hang >30min without failing (CLAUDE.md),
# and a timed-out first attempt still populates /tmp/jax_cache, so the
# retry skips straight past the compiles that burned attempt 1.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05a.log

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
    echo "=== $tag attempt $attempt timed out/crashed $(date +%H:%M:%S) ===" >&2
  done
  echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash-x2\"}" >> "$out"
}

CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0 BENCH_ASYNC=1 BENCH_WINDOW_R=16"

echo "=== stage 1: post-scanfix capacity frontier (VERDICT item 2) ===" >&2
row SERVE_CAP_R05.jsonl cap_slots192_s128_async_r16 5400 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_REQUESTS=768
row SERVE_CAP_R05.jsonl cap_slots256_s128_async_r16 5400 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=256 BENCH_REQUESTS=1024
# the original r3 OOM shape, post-scanfix
row SERVE_CAP_R05.jsonl cap_slots96_s256_async_r16 5400 benchserve.py \
  $CAPENV BENCH_SEQ=256 BENCH_SLOTS=96 BENCH_REQUESTS=384

echo "=== stage 2: markov_forced control (VERDICT item 4) ===" >&2
# exact replica of the r04c adaptive row's env so forced-vs-adaptive at
# acceptance 1.0 is a controlled comparison
SPECENV="BENCH_PRESET=7b BENCH_SUBSTRATE=markov BENCH_MARKOV_CYCLE=16 \
  BENCH_KV=int8 BENCH_ATTN=xla BENCH_SEQ=256 BENCH_SLOTS=32 \
  BENCH_REQUESTS=96 BENCH_ARRIVAL_BURST=32 BENCH_ARRIVAL_P=1 \
  BENCH_PROMPT_MAX=48 BENCH_NEW_MAX=64"
row SERVE_SPEC_R05.jsonl markov_forced 4800 benchserve.py \
  $SPECENV BENCH_SPEC_K=4 BENCH_SPEC_MODE=window

echo "=== stage 3: latency-matrix missing rows (VERDICT item 5) ===" >&2
for attempt in 1 2; do
  LAT_CONFIGS="128:128:bfloat16:xla,512:32:bfloat16:xla" \
  LAT_OUT=LATENCY_R05.csv \
    timeout 5400 python examples/latency_matrix.py 2>> "$LOG" && break
  echo "=== latency attempt $attempt failed $(date +%H:%M:%S) ===" >&2
done

echo "=== campaign_r05a done $(date +%H:%M:%S) ===" >&2
