"""Engine over a device mesh: sharded serving must match single-device."""
import jax
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine import InferenceEngine
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def test_meshed_engine_matches_single():
    cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    ecfg = EngineConfig(max_seq_len=64, prefill_chunk=8)
    prompts = [[3, 1, 4, 1], [5, 9, 2, 6, 5, 3]]

    ref = InferenceEngine(params, cfg, specs, ecfg).generate(
        prompts, max_new_tokens=6)
    mesh = make_mesh((2, 4))
    got = InferenceEngine(params, cfg, specs, ecfg, mesh=mesh).generate(
        prompts, max_new_tokens=6)
    assert ref == got


def test_meshed_spec_flash_pool_matches_single():
    """Speculative decoding on a MESHED flash/per-row-tail pool (the r5
    spec x flash composition) is token-equal to the single-device spec
    engine — the T=spec_k verify's tail staging and the kernel's
    per-query tail attend must survive shard_map over (data, model)."""
    import dataclasses

    from mixq_tpu.engine.batching import ContinuousBatchingEngine

    cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
    specs = dataclasses.replace(
        DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8)),
        attn_impl="flash")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=8,
                        kv_dtype="int8", spec_k=3)
    prompts = [[5, 6, 5, 6, 5, 6], [2, 9, 2, 9, 2]]

    def run(mesh):
        eng = ContinuousBatchingEngine(params, cfg, specs, ecfg, mesh=mesh)
        assert eng.cache.head_major and eng.cache.k_tail is not None
        ids = [eng.add_request(p, 8) for p in prompts]
        out = eng.run_to_completion()
        return [out[r] for r in ids]

    assert run(make_mesh((2, 4))) == run(None)
