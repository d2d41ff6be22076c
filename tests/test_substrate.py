"""Realistic-substrate machinery (mixq_tpu/utils/substrate.py): the
trained-LM / planted-outlier / Markov-readout evidence base that replaced
random-weight gates (VERDICT r3 item 3). CI-scale versions; the full
campaign is examples/realistic_gate.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward
from mixq_tpu.models.hf import params_from_source
from mixq_tpu.quantize import quantize_model
from mixq_tpu.quantize.online import warmup_online_outliers
from mixq_tpu.utils.substrate import (
    hf_state_from_params, make_markov_state, plant_outlier_channels,
    substrate_cfg, synth_corpus, train_tiny_lm,
)
from mixq_tpu.utils.testing import DictSource


class TestCorpus:
    def test_deterministic(self):
        a = synth_corpus(512, 4000, seed=3)
        b = synth_corpus(512, 4000, seed=3)
        assert np.array_equal(a, b)
        assert a.min() >= 2 and a.max() < 512    # 0/1 reserved (pad/BOS)

    def test_ngram_repetition(self):
        """The language must repeat n-grams verbatim (what the spec
        drafter and a tiny LM both exploit)."""
        c = synth_corpus(2048, 20000, seed=0)
        grams, rep = set(), 0
        for i in range(len(c) - 4):
            g = tuple(c[i:i + 4])
            rep += g in grams
            grams.add(g)
        assert rep / (len(c) - 4) > 0.3

    def test_held_out_same_language(self):
        """sample_seed varies the stream, seed fixes the phrase book:
        held-out text must share most 4-grams with the training stream."""
        train = synth_corpus(512, 20000, seed=0)
        held = synth_corpus(512, 4000, seed=0, sample_seed=1)
        other = synth_corpus(512, 4000, seed=9)
        tg = {tuple(train[i:i + 4]) for i in range(len(train) - 4)}
        share = np.mean([tuple(held[i:i + 4]) in tg
                         for i in range(len(held) - 4)])
        share_other = np.mean([tuple(other[i:i + 4]) in tg
                               for i in range(len(other) - 4)])
        assert not np.array_equal(held[:100], train[:100])
        assert share > 0.5 > share_other


def _fp_logits(state, cfg, tokens):
    specs = DecoderSpecs.fp16()
    p = params_from_source(DictSource(state), cfg, specs)
    cache = KVCache.create(cfg.num_hidden_layers, tokens.shape[0],
                           tokens.shape[1], cfg.num_key_value_heads,
                           cfg.head_dim_, jnp.bfloat16)
    return np.asarray(forward(p, tokens, cache, specs, cfg)[0])


class TestPlanting:
    def test_function_preserving_and_detectable(self):
        """Planted channels change the fp function by ~nothing while the
        sigma=6 online predictor finds them from activations alone."""
        cfg = substrate_cfg("tiny")
        corpus = synth_corpus(cfg.vocab_size, 4000, seed=0)
        from mixq_tpu.utils.testing import random_hf_state

        state = random_hf_state(cfg, seed=5)
        tokens = jnp.asarray(corpus[:64][None].astype(np.int32))
        base = _fp_logits(state, cfg, tokens)
        planted = [7, 100, 200]
        state = plant_outlier_channels(state, cfg, planted, gain=8.0,
                                       inner_channels=[3, 50])
        after = _fp_logits(state, cfg, tokens)
        drift = np.max(np.abs(after - base)) / (np.max(np.abs(base)) + 1e-9)
        assert drift < 0.02

        qparams, specs = quantize_model(
            DictSource(state), cfg, QuantConfig.w8a8(outlier_budget=16))
        warm = [corpus[:256].reshape(4, 64)]
        qparams, _ = warmup_online_outliers(qparams, cfg, specs, warm,
                                            sigma=6.0, max_steps=1)
        for i, bp in enumerate(qparams.blocks):
            found = set(np.asarray(bp.attn.wq.out_ind)[
                np.asarray(bp.attn.wq.out_mask) > 0].tolist())
            assert set(planted) <= found, (i, found)


class TestTraining:
    def test_loss_drops_below_chance(self):
        cfg = substrate_cfg("tiny")
        corpus = synth_corpus(cfg.vocab_size, 20000, seed=0)
        params, loss = train_tiny_lm(cfg, corpus, steps=40, batch=8,
                                     seq_len=64)
        assert loss < 0.75 * np.log(cfg.vocab_size)
        # round-trips through the HF-dict conversion into the pipeline
        state = hf_state_from_params(params, cfg)
        qp, specs = quantize_model(DictSource(state), cfg,
                                   QuantConfig.w8a8(outlier_budget=8))
        assert qp.blocks[0].attn.wq.q_weight.dtype == jnp.int8


class TestMarkovLM:
    def test_greedy_follows_chain(self):
        """A cfg-shaped Markov-readout model must greedily emit the
        planted successor table (the nonzero-spec-acceptance property)."""
        cfg = ModelConfig(model_type="llama", vocab_size=512,
                          hidden_size=256, intermediate_size=704,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=4)
        state, succ = make_markov_state(cfg, v_eff=128, seed=0)
        specs = DecoderSpecs.fp16()
        params = params_from_source(DictSource(state), cfg, specs)
        cache = KVCache.create(cfg.num_hidden_layers, 1, 32,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        tok = 5
        toks = [tok]
        for _ in range(12):
            logits, cache = forward(
                params, jnp.asarray([[tok]], jnp.int32), cache, specs, cfg)
            tok = int(jnp.argmax(logits[0, -1]))
            toks.append(tok)
        want = [5]
        for _ in range(12):
            want.append(int(succ[want[-1]]))
        assert toks == want, (toks, want)
