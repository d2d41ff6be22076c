#!/bin/bash
# Re-run the latency matrix (per-config subprocess isolation) after the
# w4 stage drains the chip.
set -u
cd "$(dirname "$0")/.."
while pgrep -f "w4_r04.sh|hw_campaign_r04.sh|ablate_r04.sh" > /dev/null; do sleep 60; done
timeout 7200 python examples/latency_matrix.py 2>> lat_r04.log
echo done
