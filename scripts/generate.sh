#!/usr/bin/env bash
# Text-generation smoke (reference generate.sh).
# Usage: scripts/generate.sh <model_or_quant_dir> [prompt...]
set -euo pipefail
MODEL=${1:?model dir}; shift || true
PROMPT=${*:-"Hello, my name is"}
python generate.py --model_path "$MODEL" --prompt "$PROMPT" \
  --max_new_tokens 64
