#!/usr/bin/env bash
# Latency percentile harness (reference runlatency.sh): TTFT + per-step
# p50/p90/p95/p99 on the TPU chip.
# Usage: scripts/runlatency.sh [batch] [kv_slots] [csv_out]
set -euo pipefail
BENCH_BATCH=${1:-256} BENCH_SEQ=${2:-128} BENCH_CSV=${3:-output/latency.csv} \
  python benchlatency.py
