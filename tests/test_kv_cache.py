"""int8 KV cache correctness tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


class TestInt8KV:
    def test_create_shapes(self):
        c = KVCache.create(2, 3, 16, 4, 8, jnp.int8)
        assert c.quantized
        assert c.k.dtype == jnp.int8
        assert c.k_scale.shape == (2, 3, 16, 4)

    def test_bf16_has_no_scales(self):
        c = KVCache.create(2, 3, 16, 4, 8, jnp.bfloat16)
        assert not c.quantized and c.k_scale is None

    def test_update_roundtrip(self):
        c = KVCache.create(1, 2, 8, 2, 4, jnp.int8)
        k = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 2, 4)) * 3.0
        v = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 2, 4))
        c = c.update_layer(0, k, v)
        ck, cv, ks, vs = c.layer_kv(0)
        k_hat = ck.astype(jnp.float32)[:, :3] * ks[:, :3, :, None]
        err = jnp.max(jnp.abs(k_hat - k))
        assert float(err) < 0.05

    def test_int8_kv_logits_close_to_bf16(self):
        """Full decoder: int8 KV must track bf16 KV closely."""
        cfg = ModelConfig.tiny()
        specs = DecoderSpecs.fp16()
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        tokens = (jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0,
                                     cfg.vocab_size)).astype(jnp.int32)

        def run(kv_dtype):
            cache = KVCache.create(cfg.num_hidden_layers, 2, 16,
                                   cfg.num_key_value_heads, cfg.head_dim_,
                                   kv_dtype)
            lg, _ = _jfwd(params, tokens, cache, specs=specs, cfg=cfg)
            return lg

        l_bf = run(jnp.bfloat16)
        l_i8 = run(jnp.int8)
        p_bf = jax.nn.softmax(l_bf[:, -1], -1)
        p_i8 = jax.nn.softmax(l_i8[:, -1], -1)
        tv = 0.5 * float(jnp.max(jnp.sum(jnp.abs(p_bf - p_i8), -1)))
        assert tv < 0.05, f"int8 KV total variation {tv}"

    def test_int8_kv_stepwise_consistency(self):
        """Prefill-at-once vs stepwise with int8 KV."""
        cfg = ModelConfig.tiny()
        specs = DecoderSpecs.fp16()
        params = init_decoder_params(jax.random.PRNGKey(1), cfg, specs)
        T = 6
        tokens = (jax.random.randint(jax.random.PRNGKey(3), (1, T), 0,
                                     cfg.vocab_size)).astype(jnp.int32)

        def cache():
            return KVCache.create(cfg.num_hidden_layers, 1, 8,
                                  cfg.num_key_value_heads, cfg.head_dim_,
                                  jnp.int8)
        lg_full, _ = _jfwd(params, tokens, cache(), specs=specs, cfg=cfg)
        c = cache()
        for t in range(T):
            lg_s, c = _jfwd(params, tokens[:, t:t+1], c, specs=specs, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(lg_full[:, -1]), np.asarray(lg_s[:, 0]),
            rtol=0.05, atol=0.1)


class TestRingKV:
    """Sliding-window KV reclaim (reference WindowedCache.roll_kv,
    fused/cache.py:25-34): a window-sized ring cache must produce the same
    logits as an unbounded cache, arbitrarily far past its slot count."""

    def _cfg(self, window=4):
        from mixq_tpu.config import ModelConfig
        return ModelConfig.tiny(model_type="mistral", sliding_window=window,
                                num_attention_heads=4, num_key_value_heads=2)

    def _params(self, cfg):
        from mixq_tpu.models.decoder import DecoderSpecs, init_decoder_params
        from mixq_tpu.ops.mixed_linear import LinearSpec
        specs = DecoderSpecs.uniform(
            LinearSpec(version="FP16", w_bit=16, out_dtype="float32"))
        return init_decoder_params(jax.random.PRNGKey(7), cfg, specs), specs

    def _decode_seq(self, cfg, params, specs, S, toks, kv_dtype=jnp.float32):
        from mixq_tpu.models.decoder import forward
        jf = jax.jit(forward, static_argnames=("specs", "cfg"))
        cache = KVCache.create(cfg.num_hidden_layers, 1, S,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               kv_dtype)
        outs = []
        for t in range(toks.shape[1]):
            lg, cache = jf(params, toks[:, t:t + 1], cache,
                           specs=specs, cfg=cfg)
            outs.append(np.asarray(lg[:, 0]))
        return np.stack(outs, 1)

    def test_decode_past_cache_size(self):
        cfg = self._cfg(window=4)
        params, specs = self._params(cfg)
        toks = jnp.asarray(
            np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 20)),
            jnp.int32)
        big = self._decode_seq(cfg, params, specs, S=64, toks=toks)
        ring = self._decode_seq(cfg, params, specs, S=8, toks=toks)  # wraps 2x
        np.testing.assert_allclose(ring, big, rtol=1e-4, atol=1e-4)

    def test_prefill_chunks_then_decode_with_wrap(self):
        """Chunked prefill (T>1, scatter write path) + decode across the wrap
        point match the unbounded cache."""
        from mixq_tpu.models.decoder import forward
        cfg = self._cfg(window=4)
        params, specs = self._params(cfg)
        jf = jax.jit(forward, static_argnames=("specs", "cfg"))
        rng = np.random.RandomState(1)
        toks = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 16)), jnp.int32)

        def run(S):
            cache = KVCache.create(cfg.num_hidden_layers, 1, S,
                                   cfg.num_key_value_heads, cfg.head_dim_,
                                   jnp.float32)
            # prefill 8 tokens in chunks of 4, then decode 8
            _, cache = jf(params, toks[:, :4], cache, specs=specs, cfg=cfg)
            _, cache = jf(params, toks[:, 4:8], cache, specs=specs, cfg=cfg)
            outs = []
            for t in range(8, 16):
                lg, cache = jf(params, toks[:, t:t + 1], cache,
                               specs=specs, cfg=cfg)
                outs.append(np.asarray(lg[:, 0]))
            return np.stack(outs, 1)

        np.testing.assert_allclose(run(8), run(64), rtol=1e-4, atol=1e-4)

    def test_ring_with_int8_kv(self):
        cfg = self._cfg(window=4)
        params, specs = self._params(cfg)
        toks = jnp.asarray(
            np.random.RandomState(2).randint(0, cfg.vocab_size, (1, 14)),
            jnp.int32)
        big = self._decode_seq(cfg, params, specs, S=64, toks=toks,
                               kv_dtype=jnp.int8)
        ring = self._decode_seq(cfg, params, specs, S=8, toks=toks,
                                kv_dtype=jnp.int8)
        np.testing.assert_allclose(ring, big, rtol=1e-4, atol=1e-4)

    def test_scan_path_ring(self):
        """Stacked-params (lax.scan) forward takes the same ring writes."""
        from mixq_tpu.models.decoder import forward, stack_decoder_params
        cfg = self._cfg(window=4)
        params, specs = self._params(cfg)
        toks = jnp.asarray(
            np.random.RandomState(3).randint(0, cfg.vocab_size, (1, 12)),
            jnp.int32)
        loop = self._decode_seq(cfg, params, specs, S=8, toks=toks)
        scan = self._decode_seq(cfg, stack_decoder_params(params), specs,
                                S=8, toks=toks)
        np.testing.assert_allclose(scan, loop, rtol=1e-4, atol=1e-4)
