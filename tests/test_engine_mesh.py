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
