#!/bin/bash
# Round-5 campaign, leg B2: unconfounded glue rows. Leg B measured flat
# rope LOSING in-model (13,359 vs 13,724 control — the in-tile lane
# rotation costs more than the relayout copies it removes), so its
# 4D-o_proj-quant and bf16-flash rows (run with MIXQ_ROPE_FLAT=1) are
# confounded. Re-measure both against the winning flat=0 program.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05b2.log

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

AB=BENCH_AB_r05.jsonl
row $AB ab_wo_quant4d_flat0 2700 bench.py MIXQ_ROPE_FLAT=0 \
  MIXQ_WO_QUANT_4D=1
# B=512 bf16-KV flash is OOM-infeasible (16.57G > 15.75G hbm: the bf16
# head-major cache + tails push the ARGUMENT footprint over —
# campaign_r05b.log); measure the S=32 bf16-flash question at B=256
# where it fits (bf16-XLA control: 12,914 tok/s, BENCH_MATRIX r3)
row $AB ab_bf16_flash_b256 2700 bench.py MIXQ_ROPE_FLAT=0 \
  BENCH_ATTN=flash BENCH_BATCH=256
# ab_glue_all beat the control (13,842 vs 13,724) while each knob alone
# LOST — either XLA fusion non-additivity or run variance. Repeat both
# back-to-back to separate the two.
row $AB ab_glue_all_rpt 2700 bench.py MIXQ_ROPE_FLAT=1 \
  MIXQ_ROPE_COMPUTE=bfloat16 MIXQ_WO_QUANT_4D=1
row $AB ab_flatrope_off_rpt 2700 bench.py MIXQ_ROPE_FLAT=0

echo "=== campaign_r05b2 done $(date +%H:%M:%S) ===" >&2
