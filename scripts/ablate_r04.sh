#!/bin/bash
# Per-op accounting stage (runs after hw_campaign_r04.sh): full-model
# ablation A/Bs at the headline config — the only per-op instrument that
# works through the relay.
set -u
cd "$(dirname "$0")/.."
while pgrep -f hw_campaign_r04.sh > /dev/null; do sleep 60; done
run() {
  local tag=$1; shift
  local line
  line=$(timeout 2400 env "$@" python bench.py 2>> bench_ablate_r04.log | tail -1)
  [ -n "$line" ] && echo "{\"tag\": \"$tag\", ${line:1}" >> BENCH_AB_r04.jsonl \
    || echo "{\"tag\": \"$tag\", \"error\": \"timeout\"}" >> BENCH_AB_r04.jsonl
}
run ablate_attn_b512 MIXQ_ABLATE_ATTN=1 BENCH_BATCH=512 BENCH_SEQ=32 \
  BENCH_KV=bfloat16 BENCH_ATTN=xla
echo done
