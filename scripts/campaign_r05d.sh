#!/bin/bash
# Round-5 campaign, leg D: the full 7B-shape accuracy matrix (VERDICT r5
# item 6), launched manually after the leg-C sensitivity probes pick the
# block_scale (gate_7b.py --block_scale; see gate7b_probe.log).
#   BS=0.006 bash scripts/campaign_r05d.sh
# Each attempt gets its own `timeout`; a timed-out attempt still fills
# /tmp/jax_cache so the retry skips the compiles (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."

BS=${BS:?set BS=<block_scale from the winning probe>}
LOG=campaign_r05d.log

for attempt in 1 2; do
  timeout 7200 python examples/gate_7b.py --segments 2 --windows 4 \
    --configs fp16,mix8,mix4,quik --kv bfloat16,int8 \
    --block_scale "$BS" --output PPL_GATE_R05_7B.json >> "$LOG" 2>&1 \
    && break
  echo "=== gate matrix attempt $attempt failed $(date +%H:%M:%S) ===" >&2
done

echo "=== campaign_r05d done $(date +%H:%M:%S) ===" >&2
