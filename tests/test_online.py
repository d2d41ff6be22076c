"""Online outlier predictor tests (warmup detect -> promote -> freeze)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.models import KVCache
from mixq_tpu.models.decoder import forward
from mixq_tpu.quantize import quantize_model
from mixq_tpu.quantize.online import warmup_online_outliers
from test_quantize_pipeline import FakeSource, make_hf_style_state

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


def outlier_model(outlier_boost=10.0):
    cfg = ModelConfig.tiny()
    state = make_hf_style_state(cfg)
    # push one embedding channel way up so downstream activations have a
    # dynamic outlier channel the calibration never saw
    state["model.embed_tokens.weight"][:, 7] += outlier_boost
    return cfg, FakeSource(state)


class TestOnlineOutliers:
    def test_warmup_promotes(self):
        cfg, src = outlier_model()
        qcfg = QuantConfig.w8a8(outlier_budget=16)
        qparams, specs = quantize_model(src, cfg, qcfg)
        batches = [np.random.RandomState(s).randint(0, cfg.vocab_size, (2, 16))
                   for s in range(2)]
        params2, counts = warmup_online_outliers(
            qparams, cfg, specs, batches, sigma=6.0)
        assert sum(counts.values()) > 0
        # channel 7 of the wqkv group (hidden dim) should be flagged
        ind = np.asarray(params2.blocks[0].attn.wq.out_ind)
        n = int(params2.blocks[0].attn.wq.out_count)
        assert 7 in ind[:n].tolist()

    def test_promotion_is_sticky_and_capped(self):
        cfg, src = outlier_model()
        qcfg = QuantConfig.w8a8(outlier_budget=4)
        qparams, specs = quantize_model(src, cfg, qcfg)
        batches = [np.random.RandomState(s).randint(0, cfg.vocab_size, (2, 16))
                   for s in range(4)]
        params2, counts = warmup_online_outliers(
            qparams, cfg, specs, batches, sigma=0.5, max_steps=2)
        # low sigma = everything looks like an outlier; budget must cap it
        assert all(v <= 4 for v in counts.values())

    def test_promotion_improves_accuracy(self):
        """Promoted model must track the fp16 model better than the
        un-promoted quantized model on outlier-heavy inputs (the reference's
        reason to exist)."""
        cfg, src = outlier_model(outlier_boost=30.0)
        from mixq_tpu.models.hf import params_from_source
        from mixq_tpu.models import DecoderSpecs

        fp_specs = DecoderSpecs.fp16()
        fp_params = params_from_source(src, cfg, fp_specs)

        qcfg = QuantConfig.w8a8(outlier_budget=16)
        qparams, specs = quantize_model(src, cfg, qcfg)
        batches = [np.random.RandomState(s).randint(0, cfg.vocab_size, (2, 16))
                   for s in range(2)]
        promoted, _ = warmup_online_outliers(qparams, cfg, specs, batches,
                                             sigma=6.0)

        tokens = jnp.asarray(
            np.random.RandomState(9).randint(0, cfg.vocab_size, (2, 12)),
            jnp.int32)

        def logits(p, s):
            cache = KVCache.create(cfg.num_hidden_layers, 2, 16,
                                   cfg.num_key_value_heads, cfg.head_dim_,
                                   jnp.bfloat16)
            return _jfwd(p, tokens, cache, specs=s, cfg=cfg)[0]

        ref = jax.nn.softmax(logits(fp_params, fp_specs)[:, -1], -1)
        tv_before = 0.5 * float(jnp.max(jnp.sum(jnp.abs(
            ref - jax.nn.softmax(logits(qparams, specs)[:, -1], -1)), -1)))
        tv_after = 0.5 * float(jnp.max(jnp.sum(jnp.abs(
            ref - jax.nn.softmax(logits(promoted, specs)[:, -1], -1)), -1)))
        assert tv_after <= tv_before + 1e-3


class TestEngineWarmup:
    def test_engine_warmup_api(self):
        """InferenceEngine.warmup_online promotes outliers and generation
        still works (full reference warmup lifecycle through the engine)."""
        from mixq_tpu.config import EngineConfig, QuantConfig
        from mixq_tpu.engine import InferenceEngine
        from mixq_tpu.quantize import quantize_model

        cfg, src = outlier_model()
        qcfg = QuantConfig.w8a8(outlier_budget=16)
        qparams, specs = quantize_model(src, cfg, qcfg)
        eng = InferenceEngine(qparams, cfg, specs,
                              EngineConfig(max_seq_len=64, prefill_chunk=8))
        batches = [np.random.RandomState(s).randint(0, cfg.vocab_size, (2, 16))
                   for s in range(2)]
        counts = eng.warmup_online(batches)
        assert sum(counts.values()) > 0
        out = eng.generate([[1, 2, 3]], max_new_tokens=4)
        assert len(out[0]) == 4


class TestWarmupPreservesNewFields:
    def test_qwen3_qk_norm_survives_warmup(self):
        """Regression: warmup promotion rebuilt blocks and silently
        dropped q/k norms (wrong logits), post-norms, and MoE params."""
        import jax

        from mixq_tpu.config import ModelConfig
        from mixq_tpu.models import DecoderSpecs
        from mixq_tpu.models.decoder import init_decoder_params
        from mixq_tpu.ops.mixed_linear import LinearSpec

        cfg = ModelConfig.tiny(qk_norm=True, post_norms=True,
                               num_key_value_heads=2)
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        batches = [np.random.RandomState(s).randint(
            0, cfg.vocab_size, (2, 8)) for s in range(2)]
        out, _ = warmup_online_outliers(params, cfg, specs, batches)
        assert out.blocks[0].attn.q_norm is not None
        assert out.blocks[0].attn.k_norm is not None
        assert out.blocks[0].post_attn_norm_scale is not None

    def test_moe_model_warmup_does_not_crash(self):
        import jax

        from mixq_tpu.config import ModelConfig
        from mixq_tpu.models import DecoderSpecs
        from mixq_tpu.models.decoder import init_decoder_params
        from mixq_tpu.ops.mixed_linear import LinearSpec

        cfg = ModelConfig.tiny(model_type="mixtral", num_local_experts=4,
                               num_experts_per_tok=2,
                               num_key_value_heads=2, intermediate_size=64)
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(1), cfg, specs)
        batches = [np.random.RandomState(0).randint(
            0, cfg.vocab_size, (2, 8))]
        out, counts = warmup_online_outliers(params, cfg, specs, batches)
        assert out.blocks[0].mlp.moe is not None
        # attention linears still promote; MoE up/down report nothing
        assert all(not k.endswith(".up") and not k.endswith(".down")
                   for k in counts)
