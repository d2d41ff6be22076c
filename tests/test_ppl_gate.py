"""The MixQ accuracy claim as a PPL gate (BASELINE.md language): on a model
with activation outliers, W8A8 + outlier handling must land within a small
delta of FP16 perplexity, and must beat naive W8A8 (no outlier path).

Uses a mid-size random model with engineered outlier channels — the
structural analogue of the paper's Llama-2 measurements (real checkpoints
aren't available in this offline environment)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.eval import compute_perplexity
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.hf import params_from_source
from mixq_tpu.quantize import quantize_model
from mixq_tpu.quantize.online import warmup_online_outliers
from test_quantize_pipeline import FakeSource, make_hf_style_state


@pytest.fixture(scope="module")
def outlier_world():
    cfg = ModelConfig.tiny(
        hidden_size=128, intermediate_size=256, num_hidden_layers=3,
        num_attention_heads=8, num_key_value_heads=4, vocab_size=512,
    )
    state = make_hf_style_state(cfg, seed=7)
    # engineered dynamic outliers: a few embedding channels with huge scale
    for ch in (5, 40, 99):
        state["model.embed_tokens.weight"][:, ch] *= 60.0
    src = FakeSource(state)
    tokens = np.random.RandomState(3).randint(0, cfg.vocab_size, 4096)
    return cfg, src, tokens


def ppl_of(params, cfg, specs, tokens, kv=jnp.bfloat16):
    return compute_perplexity(params, cfg, tokens, specs, n_ctx=128,
                              batch_size=8, max_windows=16, kv_dtype=kv).ppl


class TestPPLGate:
    def test_w8_outlier_path_beats_naive_and_tracks_fp16(self, outlier_world):
        cfg, src, tokens = outlier_world
        fp_specs = DecoderSpecs.fp16()
        fp_params = params_from_source(src, cfg, fp_specs)
        ppl_fp = ppl_of(fp_params, cfg, fp_specs, tokens)

        # naive W8A8: no outlier machinery at all
        naive_specs = DecoderSpecs.uniform(
            __import__("mixq_tpu.ops.mixed_linear", fromlist=["LinearSpec"])
            .LinearSpec(w_bit=8, a_bit=8))
        naive_params = params_from_source(src, cfg, naive_specs)
        ppl_naive = ppl_of(naive_params, cfg, naive_specs, tokens)

        # full MixQ W8A8O16: budget-reserved sets + online warmup promotion
        qcfg = QuantConfig.w8a8(outlier_budget=16)
        qparams, specs = quantize_model(src, cfg, qcfg)
        warm = [np.random.RandomState(s).randint(0, cfg.vocab_size, (4, 64))
                for s in range(2)]
        qparams, counts = warmup_online_outliers(qparams, cfg, specs, warm,
                                                 sigma=6.0)
        assert sum(counts.values()) > 0, "predictor found no outliers"
        ppl_mix = ppl_of(qparams, cfg, specs, tokens)

        # gates: mixq <= naive, and mixq within 5% of fp16 while naive isn't
        # guaranteed to be (on this engineered model naive degrades visibly)
        rel_mix = abs(ppl_mix - ppl_fp) / ppl_fp
        rel_naive = abs(ppl_naive - ppl_fp) / ppl_fp
        assert ppl_mix <= ppl_naive * 1.001, (ppl_mix, ppl_naive, ppl_fp)
        assert rel_mix < 0.05, (ppl_mix, ppl_fp)
        assert rel_mix <= rel_naive + 1e-9, (rel_mix, rel_naive)

    def test_int8_kv_tracks_bf16_kv(self, outlier_world):
        """int8 KV is the serving default candidate (it halves decode HBM
        traffic and feeds the flash kernel's MXU path natively) — its PPL
        penalty vs bf16 KV must be negligible on BOTH the fp16 and the
        quantized model (VERDICT r2 weak #4: int8-KV accuracy was tested
        structurally, not statistically)."""
        cfg, src, tokens = outlier_world
        fp_specs = DecoderSpecs.fp16()
        fp_params = params_from_source(src, cfg, fp_specs)
        ppl_bf = ppl_of(fp_params, cfg, fp_specs, tokens)
        ppl_i8 = ppl_of(fp_params, cfg, fp_specs, tokens, kv=jnp.int8)
        assert abs(ppl_i8 - ppl_bf) / ppl_bf < 0.01, (ppl_i8, ppl_bf)

        qcfg = QuantConfig.w8a8(outlier_budget=16)
        qparams, specs = quantize_model(src, cfg, qcfg)
        qp_bf = ppl_of(qparams, cfg, specs, tokens)
        qp_i8 = ppl_of(qparams, cfg, specs, tokens, kv=jnp.int8)
        assert abs(qp_i8 - qp_bf) / qp_bf < 0.01, (qp_i8, qp_bf)
