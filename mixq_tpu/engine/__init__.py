from mixq_tpu.engine.engine import InferenceEngine
from mixq_tpu.engine.sampling import SamplingParams, sample
from mixq_tpu.engine.speculative import generate_speculative

__all__ = ["InferenceEngine", "SamplingParams", "sample",
           "generate_speculative"]
