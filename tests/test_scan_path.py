"""Stacked (lax.scan) forward must match the per-layer loop exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import (
    forward, init_decoder_params, stack_decoder_params, unstack_decoder_params,
)
from mixq_tpu.ops.mixed_linear import LinearSpec

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


def run(params, cfg, specs, tokens, kv_dtype=jnp.bfloat16):
    cache = KVCache.create(cfg.num_hidden_layers, tokens.shape[0], 16,
                           cfg.num_key_value_heads, cfg.head_dim_, kv_dtype)
    lg, c = _jfwd(params, tokens, cache, specs=specs, cfg=cfg)
    return np.asarray(lg), c


class TestScanPath:
    @pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8])
    def test_matches_loop(self, kv_dtype):
        cfg = ModelConfig.tiny(num_hidden_layers=3)
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        tokens = (jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0,
                                     cfg.vocab_size)).astype(jnp.int32)
        ref, c1 = run(params, cfg, specs, tokens, kv_dtype)
        got, c2 = run(stack_decoder_params(params), cfg, specs, tokens, kv_dtype)
        # scan and loop schedule/fuse differently; int8-KV rounding can flip
        # on low-order-bit differences, so compare distributions not bits
        p_ref = np.exp(ref[:, -1] - ref[:, -1].max(-1, keepdims=True))
        p_ref /= p_ref.sum(-1, keepdims=True)
        p_got = np.exp(got[:, -1] - got[:, -1].max(-1, keepdims=True))
        p_got /= p_got.sum(-1, keepdims=True)
        tv = 0.5 * np.abs(p_ref - p_got).sum(-1).max()
        assert tv < 0.02, f"scan/loop total variation {tv}"

    def test_stack_roundtrip(self):
        cfg = ModelConfig.tiny()
        params = init_decoder_params(jax.random.PRNGKey(2), cfg)
        stacked = stack_decoder_params(params)
        assert stacked.blocks == ()
        back = unstack_decoder_params(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scan_stats_collection(self):
        cfg = ModelConfig.tiny(num_hidden_layers=2)
        specs = DecoderSpecs.fp16()
        params = init_decoder_params(jax.random.PRNGKey(3), cfg, specs)
        tokens = jnp.ones((1, 4), jnp.int32)
        cache = KVCache.create(2, 1, 8, cfg.num_key_value_heads,
                               cfg.head_dim_, jnp.bfloat16)
        _, _, stats_loop = forward(params, tokens, cache, specs, cfg,
                                   collect_stats=True)
        cache2 = KVCache.create(2, 1, 8, cfg.num_key_value_heads,
                                cfg.head_dim_, jnp.bfloat16)
        _, _, stats_scan = forward(stack_decoder_params(params), tokens,
                                   cache2, specs, cfg, collect_stats=True)
        assert set(stats_loop) == set(stats_scan)
        for k in stats_loop:
            np.testing.assert_allclose(np.asarray(stats_loop[k]),
                                       np.asarray(stats_scan[k]),
                                       rtol=0.05, atol=0.05)
