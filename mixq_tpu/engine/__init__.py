from mixq_tpu.engine.engine import InferenceEngine
from mixq_tpu.engine.sampling import SamplingParams, sample

__all__ = ["InferenceEngine", "SamplingParams", "sample"]
