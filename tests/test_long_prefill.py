"""Chunked long-prefill attention: identical results, bounded memory."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward
from mixq_tpu.models.layers import attend, attend_chunked
from mixq_tpu.models.decoder import init_decoder_params

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


class TestAttendChunked:
    def test_matches_attend(self):
        B, T, n_q, n_kv, D, S = 2, 512, 4, 2, 32, 512
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, T, n_q, D)).astype(jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, S, n_kv, D)).astype(jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, S, n_kv, D)).astype(jnp.bfloat16)
        q_slot = jnp.arange(T, dtype=jnp.int32)
        ref = attend(q, k, v, q_slot, jnp.asarray(T))
        got = attend_chunked(q, k, v, q_slot, jnp.asarray(T), chunk=128)
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(got, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_unaligned_falls_back(self):
        B, T, n_q, n_kv, D = 1, 100, 2, 2, 16
        q = jnp.ones((B, T, n_q, D), jnp.bfloat16)
        k = jnp.ones((B, T, n_kv, D), jnp.bfloat16)
        v = jnp.ones((B, T, n_kv, D), jnp.bfloat16)
        out = attend_chunked(q, k, v, jnp.arange(T), jnp.asarray(T), chunk=64)
        assert out.shape == (B, T, n_q, D)


class TestLongPrefillForward:
    def test_1k_prefill_runs_and_consistent(self):
        """1024-token prefill (chunked path) == two 512 chunks (dense path)."""
        cfg = ModelConfig.tiny(max_position_embeddings=2048)
        specs = DecoderSpecs.fp16()
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        T = 1024
        tokens = (jax.random.randint(jax.random.PRNGKey(1), (1, T), 0,
                                     cfg.vocab_size)).astype(jnp.int32)

        def cache():
            return KVCache.create(cfg.num_hidden_layers, 1, T,
                                  cfg.num_key_value_heads, cfg.head_dim_,
                                  jnp.bfloat16)
        lg_full, _ = _jfwd(params, tokens, cache(), specs=specs, cfg=cfg)
        c = cache()
        _, c = _jfwd(params, tokens[:, :512], c, specs=specs, cfg=cfg)
        lg2, _ = _jfwd(params, tokens[:, 512:], c, specs=specs, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(lg_full[:, -1]), np.asarray(lg2[:, -1]),
            rtol=2e-2, atol=2e-2)
