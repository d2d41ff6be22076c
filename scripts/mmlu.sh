#!/usr/bin/env bash
# MMLU accuracy matrix (reference mmlu.sh): few-shot logit scoring with the
# accuracy-threshold gate.
# Usage: scripts/mmlu.sh <model_or_quant_dir> <mmlu_data_dir> [ntrain]
set -euo pipefail
MODEL=${1:?model dir}; DATA=${2:?mmlu data dir}; NTRAIN=${3:-5}
python examples/mmlu.py --model_path "$MODEL" --data_dir "$DATA" \
  --ntrain "$NTRAIN" --check_accuracy --accuracy_threshold 0.3
