"""Engine smoke matrix: every architecture variant the decoder supports
runs through BOTH serving engines, and the continuous-batching pool's
greedy output equals the uniform engine's. Catches engine-x-architecture
interactions the per-family parity tests (which only run forward) miss —
e.g. post-norm or MoE blocks through windowed decode and slot reuse."""
import dataclasses

import jax
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine import InferenceEngine
from mixq_tpu.engine.batching import ContinuousBatchingEngine
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec

VARIANTS = {
    "llama_gqa": dict(),
    "qwen3_qk_norm": dict(qk_norm=True),
    "gemma_scaled": dict(embed_multiplier=8.0, gated_mlp=True,
                         hidden_act="gelu_pytorch_tanh",
                         tie_word_embeddings=True),
    "gemma2_post_softcap": dict(post_norms=True, attn_logit_softcap=50.0,
                                final_logit_softcap=30.0,
                                query_pre_attn_scalar=24.0,
                                sliding_window=8, sliding_window_pattern=2,
                                hidden_act="gelu_pytorch_tanh",
                                gated_mlp=True),
    "mistral_window": dict(model_type="mistral", sliding_window=8),
    "falcon_parallel": dict(model_type="falcon", layernorm="layernorm",
                            parallel_attn_mlp=True, hidden_act="gelu",
                            num_key_value_heads=1),
    "starcoder2_ln": dict(layernorm="layernorm",
                          hidden_act="gelu_pytorch_tanh",
                          attention_bias=True),
    "alibi": dict(alibi=True, rope_style="none"),
    "moe": dict(model_type="mixtral", num_local_experts=4,
                num_experts_per_tok=2, intermediate_size=64),
    "longrope": dict(rope_scaling_type="longrope",
                     rope_short_factor=tuple(1.0 + 0.1 * i
                                             for i in range(8)),
                     rope_long_factor=tuple(2.0 + 0.2 * i
                                            for i in range(8)),
                     rope_original_max_position=32,
                     rope_attention_factor=1.2),
}


# variants the flash kernel serves — incl. gemma2 since r5 (softcap +
# custom score scale as static kernel params; alternating windows are a
# no-op while max_seq <= sliding_window — see use_head_major_cache)
FLASH_VARIANTS = ("llama_gqa", "qwen3_qk_norm", "gemma_scaled",
                  "gemma2_post_softcap", "mistral_window", "alibi", "moe",
                  "longrope")


@pytest.mark.parametrize("name", FLASH_VARIANTS)
def test_flash_int8_cb_smoke(name):
    """Each flash-servable variant through the CB pool on the head-major
    int8 cache with per-row tail windows: completes deterministically
    (numerics differ from XLA, so token equality isn't asserted)."""
    over = dict(VARIANTS[name])
    if over.get("sliding_window"):
        if over.get("sliding_window_pattern", 1) != 1:
            # alternating windows (gemma2): head-major needs the window
            # to never bind -> window >= max_seq
            over["sliding_window"] = 64
        else:
            # the kernel's start-offset windowing requires W > tail depth
            over["sliding_window"] = 16
    cfg = ModelConfig.tiny(**over)
    specs = dataclasses.replace(
        DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8)),
        attn_impl="flash")
    params = init_decoder_params(jax.random.PRNGKey(7), cfg, specs)
    outs = []
    for _ in range(2):
        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=8,
                         kv_dtype="int8"))
        assert eng.cache.head_major and eng.cache.k_tail is not None
        ids = [eng.add_request(p, 10) for p in ([3, 1, 4, 1, 5], [2, 7])]
        out = eng.run_to_completion()
        assert all(len(out[i]) == 10 for i in ids), name
        outs.append([out[i] for i in ids])
    assert outs[0] == outs[1], name


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_cb_matches_uniform(name):
    cfg = ModelConfig.tiny(**VARIANTS[name])
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    params = init_decoder_params(jax.random.PRNGKey(7), cfg, specs)
    prompts = [[3, 1, 4, 1, 5], [2, 7]]

    ref = InferenceEngine(
        params, cfg, specs,
        EngineConfig(max_seq_len=64, prefill_chunk=8)).generate(
            prompts, max_new_tokens=6)

    eng = ContinuousBatchingEngine(
        params, cfg, specs,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=8))
    ids = [eng.add_request(p, 6) for p in prompts]
    out = eng.run_to_completion()
    assert [out[i] for i in ids] == ref, name
