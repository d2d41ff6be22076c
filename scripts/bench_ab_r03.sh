#!/bin/bash
# Round-3 in-model A/B series: mix_gemm vs XLA GEMMs, packed-W4 vs widened,
# MoE decode. Isolated-op microbenches through the relay are unusably noisy
# (GEMM_MATRIX runs showed impossible 0.0us chain differences); the
# trustworthy comparison is the difference of two FULL-MODEL bench.py
# throughputs at identical shapes.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_AB_r03.jsonl}
LOG=bench_ab.log
: > "$LOG"

run() {
  local tag=$1; shift
  echo "=== $tag: $* ===" | tee -a "$LOG" >&2
  local line
  line=$(timeout "${BENCH_TIMEOUT:-1200}" env "$@" python bench.py 2>>"$LOG" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$OUT"
  fi
  tail -3 "$LOG" >&2
}

# mix_gemm as the whole model's W8A8 path (vs matrix rows 12,914 / 13,745)
run w8_pallas_b256 MIXQ_GEMM=pallas BENCH_BATCH=256 BENCH_SEQ=32 \
  BENCH_KV=bfloat16 BENCH_ATTN=auto
run w8_pallas_b512 MIXQ_GEMM=pallas BENCH_BATCH=512 BENCH_SEQ=32 \
  BENCH_KV=bfloat16 BENCH_ATTN=xla

# W4: packed uint8 + in-kernel unpack (halved weight read) vs widened int8
run w4_packed_b512 BENCH_W=4 MIXQ_W4_PACKED=1 BENCH_BATCH=512 BENCH_SEQ=32 \
  BENCH_KV=bfloat16 BENCH_ATTN=xla
run w4_widened_b512 BENCH_W=4 MIXQ_INT4_NATIVE=0 BENCH_BATCH=512 BENCH_SEQ=32 \
  BENCH_KV=bfloat16 BENCH_ATTN=xla

# MoE decode (mixtral-shaped, scaled to one chip: 4 experts, 8 layers)
run moe_b256 BENCH_PRESET=moe BENCH_BATCH=256 BENCH_SEQ=32 \
  BENCH_KV=bfloat16 BENCH_ATTN=auto

echo "--- $OUT ---"
cat "$OUT"
