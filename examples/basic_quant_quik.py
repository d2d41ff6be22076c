"""QUIK W4A4 quantization CLI (reference examples/basic_quant_quik.py:9-33):
static calibration-time outlier split with asymmetric activation quant.
Thin wrapper over basic_quant_mix with version=QUIK, fp_features=256
(reference models/base.py:387)."""
import sys

from basic_quant_mix import main

if __name__ == "__main__":
    sys.argv += ["--version", "QUIK"]
    if "--w_bit" not in sys.argv:
        sys.argv += ["--w_bit", "4"]
    main()
