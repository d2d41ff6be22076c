#!/usr/bin/env bash
# PPL matrix (reference runppl.sh): fp16 vs quantized checkpoints.
# Usage: scripts/runppl.sh <hf_model_dir> <quant_root> <eval_tokens.npy>
set -euo pipefail
MODEL=${1:?}; QROOT=${2:?}; TOK=${3:?}
OUT=output/ppl.csv
python evalppl.py --model_path "$MODEL" --model_type fp16 \
  --eval_tokens "$TOK" --output_csv "$OUT"
for D in "$QROOT"/*/; do
  python evalppl.py --model_path "$D" --eval_tokens "$TOK" --output_csv "$OUT"
done
echo "results -> $OUT"
