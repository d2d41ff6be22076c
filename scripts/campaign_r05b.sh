#!/bin/bash
# Round-5 campaign, leg B: (1) the headline glue attack A/B series
# (VERDICT item 1 — flat rope / bf16 rope / 4D o_proj quant), then
# (2) the capacity frontier with the UNFOLDED flush (item 2 — the folded
# flush's scatter/flash layout conflict costs a whole-cache relayout temp
# that OOMs pools past 128 slots; campaign_r05a.log names the buffer).
# Per-row timeout + one retry: a timed-out first attempt still fills
# /tmp/jax_cache, so the retry skips the compiles.
set -u
cd "$(dirname "$0")/.."

LOG=campaign_r05b.log

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

echo "=== stage 1: headline glue-attack A/B (B=512 S=32 bf16 XLA W8) ===" >&2
AB=BENCH_AB_r05.jsonl
# r4 baseline control first (flat rope OFF = the shipped r4 program)
row $AB ab_flatrope_off 2700 bench.py MIXQ_ROPE_FLAT=0
# the r5 default: flat rope
row $AB ab_base_flatrope 2700 bench.py MIXQ_ROPE_FLAT=1
# + rope computed in bf16 (copy bytes halve; PPL-gated before default)
row $AB ab_rope_bf16 2700 bench.py MIXQ_ROPE_FLAT=1 \
  MIXQ_ROPE_COMPUTE=bfloat16
# + o_proj act-quant in the attend tile domain (int8 relayout, not f32)
row $AB ab_wo_quant4d 2700 bench.py MIXQ_ROPE_FLAT=1 MIXQ_WO_QUANT_4D=1
# all three
row $AB ab_glue_all 2700 bench.py MIXQ_ROPE_FLAT=1 \
  MIXQ_ROPE_COMPUTE=bfloat16 MIXQ_WO_QUANT_4D=1
# bf16-KV blocked flash in-model at S=32 (isolated microbench won 0.155
# vs XLA 0.229 ms/call in r4 but was never run in-model; no quantize
# staging cost on bf16 — the int8 tail tax may not apply)
row $AB ab_bf16_flash 2700 bench.py MIXQ_ROPE_FLAT=1 BENCH_ATTN=flash

echo "=== stage 1b: copy census of the flat-rope program ===" >&2
# compile-only: count the surviving layout copies (PROFILE_r05 §1 table)
for attempt in 1 2; do
  PROBE_LAYERS=32 MIXQ_ROPE_FLAT=1 timeout 2400 \
    python examples/hlo_probe.py bfloat16 512 32 xla >> "$LOG" 2>&1 && break
done
grep -E "copy[.0-9]* = " /tmp/hlo_bfloat16_B512_S32_xla_L32.txt \
  | grep -oE "= [a-z0-9]+\[[0-9,]*\]\{[^}]*\}" | sort | uniq -c \
  | sort -rn | head -12 > COPY_CENSUS_R05.txt || true

echo "=== stage 2: capacity frontier, unfolded flush ===" >&2
CAPENV="BENCH_PRESET=7b BENCH_KV=int8 BENCH_ATTN=auto \
  BENCH_ARRIVAL_BURST=64 BENCH_ARRIVAL_P=1 BENCH_PROMPT_MAX=48 \
  BENCH_NEW_MAX=64 BENCH_WARMUP=0 BENCH_ASYNC=1 BENCH_WINDOW_R=16 \
  BENCH_FOLD_FLUSH=0"
CAP=SERVE_CAP_R05.jsonl
# control: does unfolding cost throughput at the known-good shape?
row $CAP cap_slots128_s128_async_r16_unfold 5400 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=128 BENCH_REQUESTS=512
row $CAP cap_slots192_s128_async_r16_unfold 5400 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=192 BENCH_REQUESTS=768
row $CAP cap_slots256_s128_async_r16_unfold 5400 benchserve.py \
  $CAPENV BENCH_SEQ=128 BENCH_SLOTS=256 BENCH_REQUESTS=1024
row $CAP cap_slots96_s256_async_r16_unfold 5400 benchserve.py \
  $CAPENV BENCH_SEQ=256 BENCH_SLOTS=96 BENCH_REQUESTS=384

echo "=== campaign_r05b done $(date +%H:%M:%S) ===" >&2
