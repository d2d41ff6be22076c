#!/bin/bash
# TPU decode-throughput matrix -> BENCH_MATRIX.jsonl (one tagged JSON line
# per point). Run on the real chip when the relay is up:
#   bash scripts/bench_matrix.sh [out.jsonl]
#
# Memory arithmetic (v5e 16GB HBM, Llama-2-7B int8 weights ~6.7GB):
#   KV bytes = B * S * 2 * 32L * 32h * 128d * itemsize = B*S*256KB (int8)
#   CLAUDE.md records an erratic relay cliff at weights+KV ~10.5GB —
#   points past it are cliff probes, not headline candidates.
# Flash points need S % 128 == 0 (Mosaic DMA tiling gate).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_MATRIX.jsonl}
LOG=bench_matrix.log
: > "$LOG"

run() {
  local tag=$1; shift
  echo "=== $tag: $* ===" | tee -a "$LOG" >&2
  local line
  line=$(timeout "${BENCH_TIMEOUT:-900}" env "$@" python bench.py 2>>"$LOG" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$OUT"
  fi
  tail -3 "$LOG" >&2
}

# r1 headline reproduction + int8 at the same point (9-11GB)
run b256_s32_bf16_auto  BENCH_BATCH=256 BENCH_SEQ=32  BENCH_KV=bfloat16 BENCH_ATTN=auto
run b256_s32_int8_xla   BENCH_BATCH=256 BENCH_SEQ=32  BENCH_KV=int8    BENCH_ATTN=xla

# long-KV: flash+tail vs xla at the same shape (4.2GB KV, ~10.9GB total)
run b128_s128_int8_flash BENCH_BATCH=128 BENCH_SEQ=128 BENCH_KV=int8 BENCH_ATTN=flash
run b128_s128_int8_xla   BENCH_BATCH=128 BENCH_SEQ=128 BENCH_KV=int8 BENCH_ATTN=xla
run b128_s128_bf16_xla   BENCH_BATCH=128 BENCH_SEQ=128 BENCH_KV=bfloat16 BENCH_ATTN=xla

# B=512 (the reference workload's batch): int8 KV makes it fit (~10.9GB)
run b512_s32_int8_xla   BENCH_BATCH=512 BENCH_SEQ=32 BENCH_KV=int8 BENCH_ATTN=xla
run b512_s32_bf16_xla   BENCH_BATCH=512 BENCH_SEQ=32 BENCH_KV=bfloat16 BENCH_ATTN=xla

# longest flash context that fits with headroom (B=64 S=256: 4.2GB KV)
run b64_s256_int8_flash BENCH_BATCH=64 BENCH_SEQ=256 BENCH_KV=int8 BENCH_ATTN=flash
run b64_s256_int8_xla   BENCH_BATCH=64 BENCH_SEQ=256 BENCH_KV=int8 BENCH_ATTN=xla

# cliff probes (expected to collapse if the relay artifact persists)
run b256_s96_int8_xla   BENCH_BATCH=256 BENCH_SEQ=96 BENCH_KV=int8 BENCH_ATTN=xla
run b512_s64_int8_xla   BENCH_BATCH=512 BENCH_SEQ=64 BENCH_KV=int8 BENCH_ATTN=xla

echo "--- $OUT ---"
cat "$OUT"
