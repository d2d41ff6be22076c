#!/usr/bin/env bash
# Calibration: per-channel activation absmax scales (reference get_act.sh ->
# examples/smooth_quant_get_act.py).
# Usage: scripts/get_act.sh <hf_model_dir> <out_scales.npz> [calib_tokens.npy]
set -euo pipefail
MODEL=${1:?hf model dir}; OUT=${2:?output npz}
python examples/get_act_scales.py --model_path "$MODEL" --output "$OUT" \
  ${3:+--calib_tokens "$3"}
