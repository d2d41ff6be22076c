"""Prompt-lookup speculative decoding: drafts verified in one T=k forward
must reproduce plain greedy decode bit-for-bit, in fewer forwards."""
import jax
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine import InferenceEngine
from mixq_tpu.engine.speculative import generate_speculative, propose_ngram
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params


class TestProposeNgram:
    def test_copies_continuation_of_latest_match(self):
        h = [1, 2, 3, 9, 8, 1, 2, 3, 4, 5, 1, 2, 3]
        assert propose_ngram(h, 3, 4) == [4, 5, 1, 2]

    def test_no_match(self):
        assert propose_ngram([1, 2, 3, 4], 2, 4) == []
        assert propose_ngram([1, 2], 3, 4) == []

    def test_recency_wins(self):
        h = [7, 7, 1, 7, 7, 2, 7, 7]
        assert propose_ngram(h, 2, 1) == [2]


@pytest.fixture(scope="module")
def engine():
    cfg = ModelConfig.tiny()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    return InferenceEngine(params, cfg, DecoderSpecs.fp16(),
                           EngineConfig(max_seq_len=128, prefill_chunk=8,
                                        device_decode_loop=False))


class TestSpeculativeDecode:
    @pytest.mark.parametrize("prompt", [
        [5, 6, 7, 5, 6, 7, 5, 6],          # repetitive: drafts fire
        [3, 1, 4, 1, 5, 9, 2],             # arbitrary
        [42],                              # single token
    ])
    def test_matches_plain_greedy(self, engine, prompt):
        want = engine.generate([prompt], max_new_tokens=24)[0]
        got, stats = generate_speculative(engine, prompt,
                                          max_new_tokens=24, k=6)
        assert got == want, (got, want, stats)
        assert stats["forwards"] >= 1

    def test_acceptance_on_looping_output(self, engine):
        """Tiny random models loop; once the output repeats, n-gram
        drafts verify and the forward count drops below the token
        count."""
        prompt = [9, 9, 8, 9, 9, 8, 9, 9, 8]
        got, stats = generate_speculative(engine, prompt,
                                          max_new_tokens=48, k=8)
        assert len(got) == 48
        # not a strict guarantee for arbitrary weights, but this fixture
        # loops (verified); keep the assert so a regression that breaks
        # acceptance (always-reject) is caught
        assert stats["accepted"] > 0
        assert stats["forwards"] < 1 + len(got)

    def test_eos_stops(self, engine):
        full, _ = generate_speculative(engine, [3, 1, 4], max_new_tokens=16,
                                       k=4)
        eos = full[5]
        got, _ = generate_speculative(engine, [3, 1, 4], max_new_tokens=16,
                                      k=4, eos_token_id=eos)
        assert got[-1] == eos
        assert len(got) <= 16
