"""Tests for the sliding-window perplexity evaluator + the PPL-delta gate in
miniature (W8A8O16 within 0.1-ish of FP16 on a tiny model — BASELINE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.eval import compute_perplexity
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    key = jax.random.PRNGKey(0)
    fp_specs = DecoderSpecs.fp16()
    fp_params = init_decoder_params(key, cfg, fp_specs)
    tokens = np.random.RandomState(0).randint(0, cfg.vocab_size, 1024)
    return cfg, fp_params, fp_specs, tokens


class TestPerplexity:
    def test_basic(self, setup):
        cfg, params, specs, tokens = setup
        r = compute_perplexity(params, cfg, tokens, specs, n_ctx=64,
                               batch_size=4)
        assert r.ppl > 1.0 and np.isfinite(r.ppl)
        assert r.n_windows == 16

    def test_batch_size_invariance(self, setup):
        """Windows are independent: PPL must not depend on batching."""
        cfg, params, specs, tokens = setup
        r1 = compute_perplexity(params, cfg, tokens, specs, n_ctx=64,
                                batch_size=3)
        r2 = compute_perplexity(params, cfg, tokens, specs, n_ctx=64,
                                batch_size=16)
        assert abs(r1.ppl - r2.ppl) / r1.ppl < 1e-3

    def test_max_windows(self, setup):
        cfg, params, specs, tokens = setup
        r = compute_perplexity(params, cfg, tokens, specs, n_ctx=64,
                               batch_size=4, max_windows=4)
        assert r.n_windows == 4

    def test_quantized_ppl_gate(self, setup):
        """W8A8 PPL close to FP16 PPL (the BASELINE.md gate, miniature)."""
        cfg, fp_params, fp_specs, tokens = setup
        q_specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        q_params = init_decoder_params(jax.random.PRNGKey(0), cfg, q_specs)
        r_fp = compute_perplexity(fp_params, cfg, tokens, fp_specs, n_ctx=64,
                                  batch_size=8)
        r_q = compute_perplexity(q_params, cfg, tokens, q_specs, n_ctx=64,
                                 batch_size=8)
        # random tiny model, random tokens: ppl ~ vocab_size; relative gate
        assert abs(r_q.ppl - r_fp.ppl) / r_fp.ppl < 0.05
