#!/bin/bash
# Round-5 campaign, leg F (final session): drain the remaining hardware
# queue in strict value order under a ~1h wall budget with an EMPTY
# compile cache. Per-row `timeout` + one retry (CLAUDE.md transport
# rule); tighter timeouts than legs a-e so later rows get a chance.
#   1. leg E: recalibrated-router confirmation at the losing acceptance
#      point (the shipped spec_min_gain derivation must recover ~plain).
#   2. leg B5: layered-flush rows — the knee control re-measured under
#      the new auto default + the 192-W4 async shape the binder killed.
#   3. item 8: grouped-W4 B=32 pair (per-channel vs g=64 packed).
#   4. item 9: gemma2 softcap microbench.
#   5. item 4: markov_forced control (programs cached by leg E).
#   6. item 5: latency matrix engine-mode rows.
#   7. item 6: 7B gate sensitivity probe.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05f.log

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

echo "=== stage 1: leg E (router confirmation) $(date +%H:%M:%S) ===" >&2
row $SPEC xla_adaptive_noise0.5_recal 1800 benchserve.py $SPECENV \
  BENCH_ATTN=xla BENCH_SPEC_K=4 BENCH_SPEC_MODE=adaptive \
  BENCH_SPEC_NOISE=0.5

CAP=SERVE_CAP_R05.jsonl
CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0 BENCH_ASYNC=1 BENCH_WINDOW_R=16 \
  BENCH_FOLD_FLUSH=0"

echo "=== stage 2: leg B5 (layered flush) $(date +%H:%M:%S) ===" >&2
row $CAP cap_slots128_s128_layered 1800 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=128 BENCH_REQUESTS=512 \
  MIXQ_FLUSH_LAYERED=1
row $CAP cap_slots192_s128_w4_layered 1800 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_REQUESTS=768 \
  MIXQ_FLUSH_LAYERED=1

echo "=== stage 3: grouped-W4 pair (item 8) $(date +%H:%M:%S) ===" >&2
row BENCH_AB_r05.jsonl ab_w4_packed_perchan 1200 bench.py \
  BENCH_BATCH=32 BENCH_W=4
row BENCH_AB_r05.jsonl ab_w4_packed_g64 1200 bench.py \
  BENCH_BATCH=32 BENCH_W=4 BENCH_GROUP=64

echo "=== stage 4: softcap microbench (item 9) $(date +%H:%M:%S) ===" >&2
for attempt in 1 2; do
  MB_IMPLS=flash,flash_softcap,xla,xla_softcap MB_B=64 MB_S=256 \
    timeout 1200 python examples/attn_microbench.py \
    > MICROBENCH_SOFTCAP.jsonl 2>> "$LOG" && break
done

echo "=== stage 5: markov_forced control (item 4) $(date +%H:%M:%S) ===" >&2
row $SPEC markov_forced 1500 benchserve.py $SPECENV BENCH_ATTN=xla \
  BENCH_SPEC_K=4 BENCH_SPEC_MODE=window

echo "=== stage 6: latency engine-mode rows (item 5) $(date +%H:%M:%S) ===" >&2
for attempt in 1 2; do
  LAT_CONFIGS="128:128:bfloat16:xla,512:32:bfloat16:xla,32:256:int8:flash:async16,32:256:int8:flash:spec4" \
  LAT_OUT=LATENCY_R05.csv LAT_WINDOWS=20 \
    timeout 2400 python examples/latency_matrix.py 2>> "$LOG" && break
  echo "=== latency rows attempt $attempt failed ===" >&2
done

echo "=== stage 7: 7B gate probe (item 6) $(date +%H:%M:%S) ===" >&2
for attempt in 1 2; do
  timeout 1800 python examples/gate_7b.py --segments 2 --windows 4 \
    --configs fp16,mix4 --kv bfloat16 --block_scale 0.006 \
    --output GATE7B_PROBE_R05.json >> gate7b_probe.log 2>&1 && break
done

echo "=== stage 8: B5 memprobe layered $(date +%H:%M:%S) ===" >&2
row $CAP memprobe_slots192_w4_layered 1500 benchserve.py \
  $CAPENV BENCH_W=4 BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_MEMPROBE=1 \
  MIXQ_FLUSH_LAYERED=1

echo "=== campaign_r05f done $(date +%H:%M:%S) ===" >&2
