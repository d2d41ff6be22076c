#!/bin/bash
# Round-5 campaign, leg C: speculation (items 3+4), the 7B accuracy gate
# (item 6), latency engine-mode rows (item 5), grouped-W4 (item 8) and
# the gemma2 softcap microbench (item 9).
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05c.log

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
# the r4 spec env (controlled comparison vs markov_plain 1,256.8 /
# markov_adaptive 1,396.5)
SPECENV="BENCH_PRESET=7b BENCH_SUBSTRATE=markov BENCH_MARKOV_CYCLE=16 \
  BENCH_KV=int8 BENCH_SEQ=256 BENCH_SLOTS=32 \
  BENCH_REQUESTS=96 BENCH_ARRIVAL_BURST=32 BENCH_ARRIVAL_P=1 \
  BENCH_PROMPT_MAX=48 BENCH_NEW_MAX=64 BENCH_WARMUP=0"

echo "=== stage 1: spec x flash (item 3) ===" >&2
# plain flash control + adaptive spec ON THE FLASH POOL (the serving
# default the r4 spec path could not run on)
row $SPEC flash_plain 4800 benchserve.py $SPECENV BENCH_ATTN=flash \
  BENCH_SPEC_K=0
row $SPEC flash_adaptive 4800 benchserve.py $SPECENV BENCH_ATTN=flash \
  BENCH_SPEC_K=4 BENCH_SPEC_MODE=adaptive

echo "=== stage 2: acceptance curve (item 4) ===" >&2
# spec_draft_noise eps => acceptance ~= 1-eps on the full-coverage markov
# stream; {forced, adaptive} at each point, plain is the r4 xla control
for eps in 0.3 0.5 0.7; do
  row $SPEC "xla_forced_noise$eps" 4800 benchserve.py $SPECENV \
    BENCH_ATTN=xla BENCH_SPEC_K=4 BENCH_SPEC_MODE=window \
    BENCH_SPEC_NOISE=$eps
  row $SPEC "xla_adaptive_noise$eps" 4800 benchserve.py $SPECENV \
    BENCH_ATTN=xla BENCH_SPEC_K=4 BENCH_SPEC_MODE=adaptive \
    BENCH_SPEC_NOISE=$eps
done

echo "=== stage 3: 7B accuracy gate (item 6) ===" >&2
# sensitivity probe at two block scales (fp16+mix4 only), then the full
# matrix at whichever separates (see gate_7b.py --margin/--block_scale)
for attempt in 1 2; do
  timeout 4800 python examples/gate_7b.py --segments 2 --windows 4 \
    --configs fp16,mix4 --kv bfloat16 --block_scale 0.002 \
    --output /tmp/gate7b_probe_a.json >> gate7b_probe.log 2>&1 && break
done
for attempt in 1 2; do
  timeout 4800 python examples/gate_7b.py --segments 2 --windows 4 \
    --configs fp16,mix4 --kv bfloat16 --block_scale 0.006 \
    --output /tmp/gate7b_probe_b.json >> gate7b_probe.log 2>&1 && break
done
# pick: prefer the larger block_scale whose fp16 PPL stays sane (<50);
# the full matrix runs in campaign_r05d once the probe lands (manual gate
# — the builder reads the probes and launches the matrix)
echo "=== gate probes done; see gate7b_probe.log ===" >&2

echo "=== stage 4: latency rows (item 5) ===" >&2
# the two r4 500'd configs + the engine-mode rows (async = the shipped
# capacity mode, spec = the spec window) in one matrix run
for attempt in 1 2; do
  LAT_CONFIGS="128:128:bfloat16:xla,512:32:bfloat16:xla,32:256:int8:flash:async16,32:256:int8:flash:spec4" \
  LAT_OUT=LATENCY_R05.csv LAT_WINDOWS=30 \
    timeout 7200 python examples/latency_matrix.py 2>> "$LOG" && break
  echo "=== latency rows attempt $attempt failed ===" >&2
done

echo "=== stage 4b: markov_forced control, instrumented (item 4) ===" >&2
# 4 prior attempts died to timeouts with no evidence (r4 x2, r05a x2);
# this one has the per-window heartbeat in campaign_r05c.log
row $SPEC markov_forced 4800 benchserve.py $SPECENV BENCH_ATTN=xla \
  BENCH_SPEC_K=4 BENCH_SPEC_MODE=window

echo "=== stage 5: grouped-W4 B=32 row (item 8) ===" >&2
row BENCH_AB_r05.jsonl ab_w4_packed_perchan 2700 bench.py \
  BENCH_BATCH=32 BENCH_W=4
row BENCH_AB_r05.jsonl ab_w4_packed_g64 2700 bench.py \
  BENCH_BATCH=32 BENCH_W=4 BENCH_GROUP=64

echo "=== stage 6: gemma2 softcap microbench (item 9) ===" >&2
for attempt in 1 2; do
  MB_IMPLS=flash,flash_softcap,xla,xla_softcap MB_B=64 MB_S=256 \
    timeout 2400 python examples/attn_microbench.py \
    > MICROBENCH_SOFTCAP.jsonl 2>> "$LOG" && break
done

echo "=== campaign_r05c done $(date +%H:%M:%S) ===" >&2
