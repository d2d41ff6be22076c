"""Fully-int8 attention compute (attn_impl='xla_int8'): accuracy vs the fp
path on int8 KV."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.models.layers import attend

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


class TestInt8AttentionOp:
    def test_close_to_fp(self):
        B, S, n_kv, D = 2, 16, 2, 32
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, 1, 4, D)).astype(jnp.bfloat16)
        cache = KVCache.create(1, B, S, n_kv, D, jnp.int8)
        k_raw = jax.random.normal(ks[1], (B, S, n_kv, D)) * 2
        v_raw = jax.random.normal(ks[2], (B, S, n_kv, D))
        c = cache.update_layer(0, k_raw, v_raw)
        k, v, ksc, vsc = c.layer_kv(0)
        slot = jnp.asarray([S - 1], jnp.int32)
        ref = attend(q, k, v, slot, jnp.asarray(S), k_scale=ksc, v_scale=vsc)
        got = attend(q, k, v, slot, jnp.asarray(S), k_scale=ksc, v_scale=vsc,
                     int8_compute=True)
        err = np.abs(np.asarray(ref, np.float32)
                     - np.asarray(got, np.float32)).max()
        assert err < 0.05, err

    def test_ignored_without_int8_kv(self):
        B, S, n_kv, D = 1, 8, 2, 16
        q = jnp.ones((B, 1, 2, D), jnp.bfloat16)
        k = jnp.ones((B, S, n_kv, D), jnp.bfloat16)
        v = jnp.ones((B, S, n_kv, D), jnp.bfloat16)
        out = attend(q, k, v, jnp.asarray([S - 1]), jnp.asarray(S),
                     int8_compute=True)   # silently falls back
        assert out.shape == (B, 1, 2, D)


class TestInt8AttentionModel:
    def test_decoder_tv(self):
        cfg = ModelConfig.tiny()
        specs = DecoderSpecs.fp16()
        specs8 = dataclasses.replace(specs, attn_impl="xla_int8")
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        tokens = (jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0,
                                     cfg.vocab_size)).astype(jnp.int32)

        def run(s):
            cache = KVCache.create(cfg.num_hidden_layers, 2, 16,
                                   cfg.num_key_value_heads, cfg.head_dim_,
                                   jnp.int8)
            return _jfwd(params, tokens, cache, specs=s, cfg=cfg)[0]

        p_ref = jax.nn.softmax(run(specs)[:, -1], -1)
        p_got = jax.nn.softmax(run(specs8)[:, -1], -1)
        tv = 0.5 * float(jnp.max(jnp.sum(jnp.abs(p_ref - p_got), -1)))
        assert tv < 0.05, tv
