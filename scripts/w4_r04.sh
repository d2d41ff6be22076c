#!/bin/bash
# Full-W4 at the weight-bandwidth-bound batch (VERDICT r3 item 4): the
# reference forces down/o to 8-bit; grouped scales may buy the accuracy
# back (gate row passed) — measure the FULL weight-byte reduction at B=32.
set -u
cd "$(dirname "$0")/.."
while pgrep -f ablate_r04.sh > /dev/null; do sleep 60; done
run() {
  local tag=$1; shift
  local line
  line=$(timeout 2400 env "$@" python bench.py 2>> bench_w4_r04.log | tail -1)
  [ -n "$line" ] && echo "{\"tag\": \"$tag\", ${line:1}" >> BENCH_AB_r04.jsonl \
    || echo "{\"tag\": \"$tag\", \"error\": \"timeout\"}" >> BENCH_AB_r04.jsonl
}
B32="BENCH_BATCH=32 BENCH_SEQ=32 BENCH_KV=bfloat16 BENCH_ATTN=xla"
run w8_b32 $B32
run w4_b32 BENCH_W=4 $B32
run w4_full_g64_b32 BENCH_W=4 BENCH_FULLW4=1 BENCH_GROUP=64 $B32
echo done
