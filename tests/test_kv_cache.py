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
