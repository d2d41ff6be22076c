#!/bin/bash
# Round-5 campaign, leg E (post-leg-C): the recalibrated router's
# confirmation row. Leg C falsified "adaptive >= max(plain, forced)" at
# acceptance 0.30 (adaptive 959.3 vs plain 1,256.8 — the flat
# spec_min_gain=1.15 default never switched to plain because a T=4
# verify forward really costs ~2.7x a plain step). With the derived
# threshold 0.55*(k+1)=2.75, the router must now exit spec mode in the
# losing region and recover ~the plain rate at the same noise point.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05e.log

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

SPEC=SERVE_SPEC_R05.jsonl
SPECENV="BENCH_PRESET=7b BENCH_SUBSTRATE=markov BENCH_MARKOV_CYCLE=16 \
  BENCH_KV=int8 BENCH_SEQ=256 BENCH_SLOTS=32 \
  BENCH_REQUESTS=96 BENCH_ARRIVAL_BURST=32 BENCH_ARRIVAL_P=1 \
  BENCH_PROMPT_MAX=48 BENCH_NEW_MAX=64 BENCH_WARMUP=0"

row $SPEC xla_adaptive_noise0.5_recal 4800 benchserve.py $SPECENV \
  BENCH_ATTN=xla BENCH_SPEC_K=4 BENCH_SPEC_MODE=adaptive \
  BENCH_SPEC_NOISE=0.5

echo "=== campaign_r05e done $(date +%H:%M:%S) ===" >&2
