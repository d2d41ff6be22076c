#!/bin/bash
# Round-4 in-model A/B series (VERDICT r3 item 1: close the gap between the
# 37.3ms B=512 step and its ~17.5ms int8-GEMM floor). Optimized-HLO evidence
# (PROFILE_r04): the T=1 attention contractions lower to VPU
# convert+multiply+reduce fusions over the full KV read — the top non-GEMM
# cost. Each row is a FULL-MODEL bench.py run (isolated-op timings through
# the relay are unusable); rows compare against base re-measured today.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_AB_r04.jsonl}
LOG=bench_ab_r04.log
: > "$LOG"

run() {
  local tag=$1; shift
  echo "=== $tag: $* ===" | tee -a "$LOG" >&2
  local line
  line=$(timeout "${BENCH_TIMEOUT:-2400}" env "$@" python bench.py 2>>"$LOG" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$OUT"
  fi
  tail -3 "$LOG" >&2
}

# today's baseline (relay throughput varies day to day; compare within-run)
run base_b512 BENCH_BATCH=512 BENCH_SEQ=32 BENCH_KV=bfloat16 BENCH_ATTN=xla

# bf16 accumulation in the attention VPU fusions (halves their per-element
# f32 convert+multiply work on the 8.6GB KV read)
run attacc_bf16_b512 MIXQ_ATTN_ACC=bf16 BENCH_BATCH=512 BENCH_SEQ=32 \
  BENCH_KV=bfloat16 BENCH_ATTN=xla

# int8 KV + flash MXU kernel at S=32 (halves KV read; r3 dismissed this on
# an isolated microbench of the class now proven untrustworthy)
run int8_flash_b512 BENCH_BATCH=512 BENCH_SEQ=32 BENCH_KV=int8 \
  BENCH_ATTN=flash

# int8 KV with both XLA contractions int8 (no K/V widening pass)
run int8_xla8_b512 BENCH_BATCH=512 BENCH_SEQ=32 BENCH_KV=int8 \
  BENCH_ATTN=xla_int8

echo "--- $OUT ---"
cat "$OUT"
