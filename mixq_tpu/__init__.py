"""mixq_tpu — a TPU-native mixed-precision LLM inference framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of Qcompiler/MIXQ
(SC'24 "MixQ: Taming Dynamic Outliers in Mixed-Precision Quantization by
Online Prediction"): W8A8O16 / W4A4+FP16-outlier quantized inference with an
online outlier predictor, calibration pipeline, multi-model support, and
multi-chip/multi-host scaling over a jax.sharding.Mesh.
"""

from mixq_tpu.config import EngineConfig, ModelConfig, QuantConfig

__version__ = "0.1.0"

__all__ = ["QuantConfig", "ModelConfig", "EngineConfig", "__version__"]
