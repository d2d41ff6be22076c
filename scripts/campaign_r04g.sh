#!/bin/bash
# Round-4 campaign, sixth leg: the remaining capacity question.
# Post-scanfix, jit(window_async) at 192 slots still carries ONE 3.0G
# whole-v-cache copy (k's is gone) + a 384M tail-carry copy -> 17.48G
# OOM (campaign_r04f.log). Arguments alone are 13.98G at 192 slots
# (weights 7.1G + MHA int8 KV 6.4G + scales/tails), so 256 can never
# fit; 192 fits iff the v copy dies. The sync window program may not
# have it (the r04b-era 3G copy was cache.K in jit(window); the fix
# killed that one) — probe with sync rows at 192.
set -u
cd "$(dirname "$0")/.."

row() {
  local out=$1 tag=$2 prog=$3; shift 3
  local line
  line=$(timeout 3600 env "$@" python "$prog" 2>> campaign_r04g.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$out"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$out"
  fi
  echo "=== $tag done $(date +%H:%M:%S) ===" >&2
}

CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0 BENCH_SEQ=128"

echo "=== sync windows at 192 slots ===" >&2
row SERVE_CAP_R04.jsonl cap_slots192_s128_sync_r16 benchserve.py \
  $CAPENV BENCH_SLOTS=192 BENCH_REQUESTS=768 BENCH_WINDOW_R=16
row SERVE_CAP_R04.jsonl cap_slots192_s128_sync_r8 benchserve.py \
  $CAPENV BENCH_SLOTS=192 BENCH_REQUESTS=768

echo "=== campaign_r04g done ===" >&2
