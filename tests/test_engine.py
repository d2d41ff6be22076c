"""Tests for the inference engine (generate, sampling, KV donation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine import InferenceEngine, SamplingParams
from mixq_tpu.engine.sampling import sample
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec


def make_engine(quant=False, **ecfg):
    cfg = ModelConfig.tiny()
    if quant:
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    else:
        specs = DecoderSpecs.fp16()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    engine_cfg = EngineConfig(max_seq_len=64, prefill_chunk=8, **ecfg)
    return InferenceEngine(params, cfg, specs, engine_cfg), cfg


class TestSampling:
    def test_greedy(self):
        logits = jnp.array([[0.0, 3.0, 1.0], [5.0, 0.0, 0.0]])
        out = sample(logits, None, SamplingParams(temperature=0.0))
        np.testing.assert_array_equal(np.asarray(out), [1, 0])

    def test_top_k_restricts(self):
        logits = jnp.array([[10.0, 9.0, -50.0, -50.0]])
        key = jax.random.PRNGKey(0)
        for seed in range(5):
            out = sample(logits, jax.random.PRNGKey(seed),
                         SamplingParams(temperature=1.0, top_k=2))
            assert int(out[0]) in (0, 1)

    def test_top_p_restricts(self):
        logits = jnp.array([[10.0, 1.0, 0.0, -1.0]])
        out = sample(logits, jax.random.PRNGKey(0),
                     SamplingParams(temperature=1.0, top_p=0.5))
        assert int(out[0]) == 0


class TestGenerate:
    def test_generate_shapes(self):
        engine, cfg = make_engine()
        prompts = [[1, 2, 3], [4, 5, 6, 7, 8]]
        out = engine.generate(prompts, max_new_tokens=6)
        assert len(out) == 2
        assert all(len(o) == 6 for o in out)
        assert all(0 <= t < cfg.vocab_size for o in out for t in o)

    def test_greedy_deterministic(self):
        engine, cfg = make_engine()
        prompts = [[1, 2, 3]]
        a = engine.generate(prompts, max_new_tokens=5)
        b = engine.generate(prompts, max_new_tokens=5)
        assert a == b

    def test_generate_matches_manual_decode(self):
        """generate() greedy == manual forward argmax chain (KV-cache path
        correctness at the engine level)."""
        engine, cfg = make_engine()
        from mixq_tpu.models.decoder import forward
        prompt = [3, 1, 4, 1, 5]
        out = engine.generate([prompt], max_new_tokens=4)[0]

        specs = engine.specs if hasattr(engine, "specs") else DecoderSpecs.fp16()
        cache = engine.new_cache(1, 64)
        toks = list(prompt)
        preds = []
        for _ in range(4):
            c2 = engine.new_cache(1, 64)
            lg, _ = jax.jit(forward, static_argnames=("specs", "cfg"))(
                engine.params, jnp.asarray([toks], jnp.int32), c2,
                specs=DecoderSpecs.fp16(), cfg=cfg)
            nxt = int(jnp.argmax(lg[0, -1]))
            preds.append(nxt)
            toks.append(nxt)
        assert out == preds

    def test_quantized_generate_runs(self):
        engine, cfg = make_engine(quant=True)
        out = engine.generate([[1, 2, 3]], max_new_tokens=4)
        assert len(out[0]) == 4

    def test_eos_stops(self):
        engine, cfg = make_engine()
        # find the first greedy token, then use it as "eos"
        first = engine.generate([[1, 2]], max_new_tokens=1)[0][0]
        out = engine.generate([[1, 2]], max_new_tokens=8, eos_token_id=first)[0]
        assert out == [first]

    def test_sampled_generation_valid(self):
        engine, cfg = make_engine()
        out = engine.generate(
            [[1, 2, 3]], max_new_tokens=5,
            sampling=SamplingParams(temperature=0.8, top_k=10), seed=42)
        assert len(out[0]) == 5


class TestQuikEngine:
    def test_quik_generate(self):
        """QUIK W4A4 params serve through the engine end-to-end."""
        import numpy as np
        from mixq_tpu.config import QuantConfig
        from mixq_tpu.quantize import quantize_model
        from test_quantize_pipeline import FakeSource, make_hf_style_state

        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        calib = [np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 32))]
        qparams, specs = quantize_model(
            src, cfg, QuantConfig.quik_w4a4(outlier_budget=8),
            calib_batches=calib)
        eng = InferenceEngine(qparams, cfg, specs,
                              EngineConfig(max_seq_len=64, prefill_chunk=8))
        out = eng.generate([[1, 2, 3]], max_new_tokens=4)
        assert len(out[0]) == 4


class TestLogprobs:
    def test_generate_return_logprobs_both_paths(self):
        """return_logprobs: one logprob per emitted token, identical
        tokens to the plain call, on the stepwise AND device-loop
        paths."""
        import numpy as np

        from mixq_tpu.config import EngineConfig, ModelConfig
        from mixq_tpu.models import DecoderSpecs
        from mixq_tpu.models.decoder import init_decoder_params

        cfg = ModelConfig.tiny()
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        for dev in (False, True):
            eng = InferenceEngine(
                params, cfg, DecoderSpecs.fp16(),
                EngineConfig(max_seq_len=64, prefill_chunk=8,
                             device_decode_loop=dev))
            plain = eng.generate([[1, 2, 3], [4, 5]], max_new_tokens=6)
            toks, lps = eng.generate([[1, 2, 3], [4, 5]], max_new_tokens=6,
                                     return_logprobs=True)
            assert toks == plain
            for t, l in zip(toks, lps):
                assert len(l) == len(t)
                assert all(np.isfinite(x) and x <= 0.0 for x in l)
