from mixq_tpu.eval.perplexity import PerplexityResult, compute_perplexity

__all__ = ["PerplexityResult", "compute_perplexity"]
