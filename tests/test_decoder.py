"""Tests for the functional decoder (mixq_tpu/models/decoder.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.models.decoder import (
    DecoderSpecs, forward, init_decoder_params,
)
from mixq_tpu.models.layers import KVCache
from mixq_tpu.ops.mixed_linear import LinearSpec


def fp32_specs():
    s = LinearSpec(version="FP16", w_bit=16, out_dtype="float32")
    return DecoderSpecs.uniform(s)


# jit-compiled forward (specs/cfg are hashable statics); eager dispatch of a
# full decoder is 10-20x slower on CPU
_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


def forward(params, tokens, cache, specs, cfg, kv_start=None):  # noqa: F811
    return _jfwd(params, tokens, cache, specs=specs, cfg=cfg, kv_start=kv_start)


def make_model(cfg=None, specs=None, key=0):
    cfg = cfg or ModelConfig.tiny()
    specs = specs or fp32_specs()
    params = init_decoder_params(jax.random.PRNGKey(key), cfg, specs)
    return params, cfg, specs


def new_cache(cfg, B, S=64):
    return KVCache.create(
        cfg.num_hidden_layers, B, S, cfg.num_key_value_heads, cfg.head_dim_,
        dtype=jnp.float32,
    )


class TestForward:
    def test_shapes(self):
        params, cfg, specs = make_model()
        tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % cfg.vocab_size
        logits, cache = forward(params, tokens, new_cache(cfg, 2), specs, cfg)
        assert logits.shape == (2, 6, cfg.vocab_size)
        assert int(cache.length) == 6

    def test_prefill_vs_stepwise_consistency(self):
        """KV-cache correctness: running T tokens at once must give the same
        final logits as feeding them one at a time through the cache."""
        params, cfg, specs = make_model()
        T = 8
        tokens = (jax.random.randint(jax.random.PRNGKey(1), (1, T), 0,
                                     cfg.vocab_size)).astype(jnp.int32)
        logits_full, _ = forward(params, tokens, new_cache(cfg, 1), specs, cfg)

        cache = new_cache(cfg, 1)
        step_logits = []
        for t in range(T):
            lg, cache = forward(params, tokens[:, t:t + 1], cache, specs, cfg)
            step_logits.append(lg[:, 0])
        step_logits = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(
            np.asarray(logits_full), np.asarray(step_logits), rtol=2e-3, atol=2e-3
        )

    def test_chunked_prefill_consistency(self):
        """Prefill in two chunks == prefill at once (chunked-prefill support)."""
        params, cfg, specs = make_model()
        tokens = (jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0,
                                     cfg.vocab_size)).astype(jnp.int32)
        logits_full, _ = forward(params, tokens, new_cache(cfg, 2), specs, cfg)
        cache = new_cache(cfg, 2)
        _, cache = forward(params, tokens[:, :5], cache, specs, cfg)
        logits2, _ = forward(params, tokens[:, 5:], cache, specs, cfg)
        np.testing.assert_allclose(
            np.asarray(logits_full[:, 5:]), np.asarray(logits2), rtol=2e-3, atol=2e-3
        )

    def test_left_padding_matches_unpadded(self):
        """A left-padded prompt with kv_start masking must produce the same
        last-token logits as the unpadded prompt."""
        params, cfg, specs = make_model()
        T = 6
        tokens = (jax.random.randint(jax.random.PRNGKey(3), (1, T), 0,
                                     cfg.vocab_size)).astype(jnp.int32)
        logits_ref, _ = forward(params, tokens, new_cache(cfg, 1), specs, cfg)

        pad = 4
        padded = jnp.concatenate(
            [jnp.zeros((1, pad), jnp.int32), tokens], axis=1
        )
        kv_start = jnp.array([pad], jnp.int32)
        logits_pad, _ = forward(
            params, padded, new_cache(cfg, 1), specs, cfg, kv_start=kv_start
        )
        np.testing.assert_allclose(
            np.asarray(logits_ref[:, -1]), np.asarray(logits_pad[:, -1]),
            rtol=2e-3, atol=2e-3,
        )

    def test_causality(self):
        """Changing a future token must not affect past logits."""
        params, cfg, specs = make_model()
        t1 = jnp.array([[1, 2, 3, 4, 5, 6]], jnp.int32)
        t2 = t1.at[0, 4].set(9)
        l1, _ = forward(params, t1, new_cache(cfg, 1), specs, cfg)
        l2, _ = forward(params, t2, new_cache(cfg, 1), specs, cfg)
        np.testing.assert_allclose(
            np.asarray(l1[:, :4]), np.asarray(l2[:, :4]), rtol=1e-4, atol=1e-5
        )
        assert not np.allclose(np.asarray(l1[:, 4]), np.asarray(l2[:, 4]))

    def test_gqa_vs_mha_shapes(self):
        cfg = ModelConfig.tiny(num_key_value_heads=1)  # MQA
        params, cfg, specs = make_model(cfg)
        tokens = jnp.ones((1, 4), jnp.int32)
        logits, _ = forward(params, tokens, new_cache(cfg, 1), specs, cfg)
        assert logits.shape == (1, 4, cfg.vocab_size)

    def test_tied_embeddings(self):
        cfg = ModelConfig.tiny(tie_word_embeddings=True)
        params, cfg, specs = make_model(cfg)
        assert params.lm_head is None
        tokens = jnp.ones((1, 4), jnp.int32)
        logits, _ = forward(params, tokens, new_cache(cfg, 1), specs, cfg)
        assert logits.shape == (1, 4, cfg.vocab_size)


class TestArchVariants:
    def test_parallel_block_falcon_style(self):
        cfg = ModelConfig.tiny(
            parallel_attn_mlp=True, layernorm="layernorm", hidden_act="gelu",
            num_key_value_heads=1,
        )
        params, cfg, specs = make_model(cfg)
        assert params.blocks[0].mlp.gate is None
        assert params.blocks[0].ln2_scale is None
        tokens = jnp.ones((2, 4), jnp.int32)
        logits, _ = forward(params, tokens, new_cache(cfg, 2), specs, cfg)
        assert logits.shape == (2, 4, cfg.vocab_size)
        assert not np.any(np.isnan(np.asarray(logits)))

    def test_flat_rope_matches_per_head(self):
        """apply_rope_flat (the layout-copy-free decode formulation,
        PROFILE_r04 §3.3 glue fix) is bit-identical to apply_rope in f32:
        same multiply/add operand values, a-b == a+(-b) in IEEE."""
        from mixq_tpu.models.layers import (
            apply_rope, apply_rope_flat, rope_cos_sin)

        key = jax.random.PRNGKey(3)
        for B, T, h, d in [(4, 1, 8, 64), (2, 5, 3, 32), (1, 1, 32, 128)]:
            x = jax.random.normal(key, (B, T, h * d), jnp.float32)
            # shared positions [T, d/2] and per-row positions [B, T, d/2]
            for pos in (jnp.arange(T), jnp.arange(B * T).reshape(B, T)):
                cos, sin = rope_cos_sin(pos, d)
                ref = apply_rope(
                    x.reshape(B, T, h, d), cos, sin, "neox")
                got = apply_rope_flat(x, cos, sin, d)
                np.testing.assert_array_equal(
                    np.asarray(got.reshape(B, T, h, d)), np.asarray(ref))

    def test_flat_rope_forward_parity(self, monkeypatch):
        """Full forward is identical with the flat-rope path on and off
        (the bench A/B knob must not change tokens)."""
        from mixq_tpu.models.decoder import forward as raw_forward

        params, cfg, specs = make_model()
        tokens = jnp.asarray([[3, 1, 4, 1], [5, 9, 2, 6]], jnp.int32)
        out = {}
        for knob in ("0", "1"):
            monkeypatch.setenv("MIXQ_ROPE_FLAT", knob)
            # fresh jit per knob: the env var is read at trace time, so a
            # shared jit cache would silently reuse one trace for both
            f = jax.jit(raw_forward, static_argnames=("specs", "cfg"))
            out[knob], _ = f(params, tokens, new_cache(cfg, 2),
                             specs=specs, cfg=cfg)
        np.testing.assert_array_equal(np.asarray(out["1"]),
                                      np.asarray(out["0"]))

    def test_gptj_rope_partial_rotary(self):
        cfg = ModelConfig.tiny(
            rope_style="gptj", rotary_dim=8, layernorm="layernorm",
            parallel_attn_mlp=True, hidden_act="gelu",
            num_key_value_heads=4,
        )
        params, cfg, specs = make_model(cfg)
        tokens = jnp.ones((1, 5), jnp.int32)
        logits, cache = forward(params, tokens, new_cache(cfg, 1), specs, cfg)
        assert not np.any(np.isnan(np.asarray(logits)))
        # stepwise consistency holds for the variant rope too
        logits_s, cache2 = None, new_cache(cfg, 1)
        for t in range(5):
            logits_s, cache2 = forward(params, tokens[:, t:t+1], cache2, specs, cfg)
        np.testing.assert_allclose(
            np.asarray(logits[:, -1]), np.asarray(logits_s[:, 0]),
            rtol=2e-3, atol=2e-3,
        )


class TestQuantizedDecoder:
    def test_w8a8_close_to_fp(self):
        cfg = ModelConfig.tiny()
        key = jax.random.PRNGKey(0)
        fp_params = init_decoder_params(key, cfg, fp32_specs())
        q_specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        q_params = init_decoder_params(key, cfg, q_specs)  # same key => same fp weights
        tokens = (jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0,
                                     cfg.vocab_size)).astype(jnp.int32)
        lf, _ = forward(fp_params, tokens, new_cache(cfg, 2), fp32_specs(), cfg)
        lq, _ = forward(q_params, tokens, new_cache(cfg, 2), q_specs, cfg)
        # compare next-token distributions via top-1 agreement + KL-ish gap
        pf = jax.nn.softmax(lf[:, -1], axis=-1)
        pq = jax.nn.softmax(lq[:, -1], axis=-1)
        tv = 0.5 * float(jnp.max(jnp.sum(jnp.abs(pf - pq), axis=-1)))
        assert tv < 0.12, f"total variation too large: {tv}"

    def test_wo_quant_4d_parity(self, monkeypatch):
        """MIXQ_WO_QUANT_4D (quantize the attention output in its
        [B,T,h,d] tile domain before the flatten — glue-copy attack,
        PROFILE_r04 §3.3) is bit-identical to the flat path, including
        the outlier gather through the flat view."""
        import numpy as np

        from mixq_tpu.config import QuantConfig
        from mixq_tpu.models.decoder import forward as raw_forward
        from mixq_tpu.quantize import quantize_model
        from mixq_tpu.utils.testing import DictSource, random_hf_state

        cfg = ModelConfig.tiny()
        state = random_hf_state(cfg, seed=3, outlier_channels=(5, 17, 30))
        qparams, qspecs = quantize_model(
            DictSource(state), cfg, QuantConfig.w8a8(outlier_budget=8),
            calib_batches=[np.random.RandomState(0).randint(
                1, cfg.vocab_size, (2, 16))])
        assert qparams.blocks[0].attn.wo.outlier_set is not None
        tokens = jnp.asarray([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]], jnp.int32)
        out = {}
        for knob in ("0", "1"):
            monkeypatch.setenv("MIXQ_WO_QUANT_4D", knob)
            f = jax.jit(raw_forward, static_argnames=("specs", "cfg"))
            out[knob], _ = f(qparams, tokens, new_cache(cfg, 2),
                             specs=qspecs, cfg=cfg)
        np.testing.assert_array_equal(np.asarray(out["1"]),
                                      np.asarray(out["0"]))

    def test_jit_forward(self):
        params, cfg, specs = make_model()
        f = jax.jit(lambda p, t, c: forward(p, t, c, specs, cfg))
        tokens = jnp.ones((1, 4), jnp.int32)
        logits, cache = f(params, tokens, new_cache(cfg, 1))
        assert logits.shape == (1, 4, cfg.vocab_size)
