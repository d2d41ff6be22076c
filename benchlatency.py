"""Latency-focused benchmark CLI (reference benchlatency.py): same engine
sweep as benchflops.py but reporting per-step latency percentiles come from
the chain deltas there; this is a thin alias kept for driver-script parity.

  python benchlatency.py --model_path DIR [--batch_sizes 1,8,32]
"""
import sys

from benchflops import main

if __name__ == "__main__":
    if "--batch_sizes" not in " ".join(sys.argv):
        sys.argv += ["--batch_sizes", "1,8,32"]
    main()
