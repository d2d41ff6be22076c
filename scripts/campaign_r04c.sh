#!/bin/bash
# Round-4 campaign, third leg (the r04b run was cut by a session stall):
#   1. capacity rows at memory-feasible shapes: the slots=96 @ max_seq=256
#      OOM is pinned (campaign_r04b.log): XLA inserts a 3.0G whole-k-cache
#      relayout copy inside jit(window), so 96@256 needs 16.5G. Feasible:
#      slots=128 @ max_seq=128 (~14.4G) and slots=96 @ max_seq=192 (~14.7G).
#   2. 7B Markov-substrate speculative serving A/B  -> SERVE_SPEC_R04.jsonl
#   3. latency-matrix rows beyond 32:256:int8:flash -> LATENCY_R04.csv
#   4. full-W4 B=32 bench trio                      -> BENCH_AB_r04.jsonl
# Serialized: ONE process on the chip at a time.
set -u
cd "$(dirname "$0")/.."

row() {
  local out=$1 tag=$2 prog=$3; shift 3
  local line
  line=$(timeout 3600 env "$@" python "$prog" 2>> campaign_r04c.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line:1}" >> "$out"
  else
    echo "{\"tag\": \"$tag\", \"error\": \"timeout-or-crash\"}" >> "$out"
  fi
  echo "=== $tag done $(date +%H:%M:%S) ===" >&2
}

echo "=== stage 1: capacity (memory-feasible shapes) ===" >&2
CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0"
row SERVE_CAP_R04.jsonl cap_slots128_s128 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=128 BENCH_REQUESTS=512
row SERVE_CAP_R04.jsonl cap_slots96_s192 benchserve.py \
  $CAPENV BENCH_SEQ=192 BENCH_SLOTS=96 BENCH_REQUESTS=384

echo "=== stage 2: markov speculative serving (7B shapes) ===" >&2
SPECENV="BENCH_PRESET=7b BENCH_SUBSTRATE=markov BENCH_MARKOV_CYCLE=16 \
  BENCH_KV=int8 BENCH_ATTN=xla BENCH_SEQ=256 BENCH_SLOTS=32 \
  BENCH_REQUESTS=96 BENCH_ARRIVAL_BURST=32 BENCH_ARRIVAL_P=1 \
  BENCH_PROMPT_MAX=48 BENCH_NEW_MAX=64"
row SERVE_SPEC_R04.jsonl markov_plain    benchserve.py $SPECENV BENCH_SPEC_K=0
row SERVE_SPEC_R04.jsonl markov_adaptive benchserve.py $SPECENV BENCH_SPEC_K=4 BENCH_SPEC_MODE=adaptive
row SERVE_SPEC_R04.jsonl markov_forced   benchserve.py $SPECENV BENCH_SPEC_K=4 BENCH_SPEC_MODE=window

echo "=== stage 3: latency matrix (all 6 configs; OUT is overwritten, so" >&2
echo "    the already-landed 32:256:int8:flash row is re-run from cache) ===" >&2
LAT_CONFIGS="32:256:int8:flash,32:256:bfloat16:xla,128:128:int8:flash,128:128:bfloat16:xla,512:32:bfloat16:xla,512:32:int8:flash" \
  timeout 10800 python examples/latency_matrix.py 2>> campaign_r04c.log
echo "=== latency done $(date +%H:%M:%S) ===" >&2

echo "=== stage 4: full-W4 at B=32 ===" >&2
B32="BENCH_BATCH=32 BENCH_SEQ=32 BENCH_KV=bfloat16 BENCH_ATTN=xla"
row BENCH_AB_r04.jsonl w8_b32          bench.py $B32
row BENCH_AB_r04.jsonl w4_b32          bench.py BENCH_W=4 $B32
row BENCH_AB_r04.jsonl w4_full_g64_b32 bench.py BENCH_W=4 BENCH_FULLW4=1 BENCH_GROUP=64 $B32

echo "=== campaign_r04c done ===" >&2
