#!/usr/bin/env bash
# Quantization matrix driver (reference quant.sh): quantize a model at
# several bit-widths. Usage: scripts/quant.sh <hf_model_dir> <out_root>
set -euo pipefail
MODEL=${1:?hf model dir}
OUT=${2:?output root}
for CFG in "8 MIX" "4 MIX" "4 QUIK"; do
  set -- $CFG
  W=$1; V=$2
  echo "=== quantizing W${W} ${V} ==="
  python examples/basic_quant_mix.py --model_path "$MODEL" \
    --quant_file "$OUT/w${W}_${V,,}" --w_bit "$W" --version "$V" \
    ${CALIB_TOKENS:+--calib_tokens "$CALIB_TOKENS"}
done
