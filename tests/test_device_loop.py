"""Device-side decode loop (engine lax.while_loop path): token-for-token
equality with the stepwise host loop, EOS early exit, sampled decoding."""
import jax
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine import InferenceEngine, SamplingParams
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec


@pytest.fixture(scope="module")
def world():
    cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    return cfg, specs, params


def engines(world, **cfg_kw):
    cfg, specs, params = world
    base = dict(max_seq_len=64, prefill_chunk=8)
    e_loop = InferenceEngine(params, cfg, specs,
                             EngineConfig(**base, device_decode_loop=True,
                                          **cfg_kw))
    e_step = InferenceEngine(params, cfg, specs,
                             EngineConfig(**base, device_decode_loop=False,
                                          **cfg_kw))
    return e_loop, e_step


class TestDeviceDecodeLoop:
    def test_greedy_matches_stepwise(self, world):
        e_loop, e_step = engines(world)
        prompts = [[1, 5, 9, 4], [2, 2, 7]]
        assert (e_loop.generate(prompts, max_new_tokens=8)
                == e_step.generate(prompts, max_new_tokens=8))

    def test_sampled_matches_stepwise(self, world):
        """Same PRNG key-splitting sequence -> identical sampled tokens."""
        e_loop, e_step = engines(world)
        sp = SamplingParams(temperature=0.8, top_k=16)
        got = e_loop.generate([[1, 2, 3]], max_new_tokens=8, sampling=sp,
                              seed=11)
        ref = e_step.generate([[1, 2, 3]], max_new_tokens=8, sampling=sp,
                              seed=11)
        assert got == ref

    def test_eos_early_exit_and_trim(self, world):
        cfg, specs, params = world
        e_loop, e_step = engines(world)
        # pick the greedy token after this prompt as the "EOS" so rows stop
        probe = e_step.generate([[3, 3, 3]], max_new_tokens=3)[0]
        eos = probe[1]
        got = e_loop.generate([[3, 3, 3]], max_new_tokens=8,
                              eos_token_id=eos)
        ref = e_step.generate([[3, 3, 3]], max_new_tokens=8,
                              eos_token_id=eos)
        assert got == ref
        assert got[0][-1] == eos and len(got[0]) <= 8

    def test_int8_kv(self, world):
        e_loop, e_step = engines(world, kv_dtype="int8")
        prompts = [[4, 4, 4, 4]]
        assert (e_loop.generate(prompts, max_new_tokens=6)
                == e_step.generate(prompts, max_new_tokens=6))
