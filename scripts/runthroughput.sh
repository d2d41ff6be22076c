#!/usr/bin/env bash
# Decode throughput sweep (reference runthroughput.sh).
# Usage: scripts/runthroughput.sh <model_or_quant_dir> [batch_sizes]
set -euo pipefail
MODEL=${1:?}; BS=${2:-32,64,128,256}
python benchflops.py --model_path "$MODEL" --batch_sizes "$BS" \
  --output_csv output/throughput.csv
