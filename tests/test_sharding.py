"""Multi-device sharding tests on the 8-device virtual CPU mesh
(TP/DP over jax.sharding.Mesh — SURVEY.md §4's prescribed strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.parallel import (
    make_mesh, shard_decoder_params, shard_kv_cache,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def tiny_cfg():
    # dims divisible by tp=4: heads 4, kv 4, hidden 64, intermediate 128
    return ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)


_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


class TestSharding:
    def test_tp_matches_single_device(self):
        """Logits under 4-way TP must equal unsharded logits."""
        cfg = tiny_cfg()
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        tokens = jnp.ones((2, 8), jnp.int32)
        cache = KVCache.create(cfg.num_hidden_layers, 2, 16,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        ref, _ = _jfwd(params, tokens, cache, specs=specs, cfg=cfg)

        mesh = make_mesh((2, 4))
        sparams = shard_decoder_params(params, mesh)
        scache = shard_kv_cache(
            KVCache.create(cfg.num_hidden_layers, 2, 16,
                           cfg.num_key_value_heads, cfg.head_dim_,
                           jnp.bfloat16), mesh)
        got, _ = _jfwd(sparams, tokens, scache, specs=specs, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(got, np.float32),
            rtol=1e-2, atol=1e-2)

    def test_param_shardings_applied(self):
        cfg = tiny_cfg()
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        mesh = make_mesh((1, 8))
        sp = shard_decoder_params(params, mesh)
        wq = sp.blocks[0].attn.wq.q_weight
        # column-parallel: N axis split over 'model'
        assert wq.sharding.spec == P(None, "model")
        wo = sp.blocks[0].attn.wo.q_weight
        assert wo.sharding.spec == P("model", None)

    def test_dp_batch_sharding(self):
        """Batch sharded over 'data' axis produces identical results."""
        cfg = tiny_cfg()
        specs = DecoderSpecs.fp16()
        params = init_decoder_params(jax.random.PRNGKey(1), cfg, specs)
        tokens = (jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0,
                                     cfg.vocab_size)).astype(jnp.int32)
        cache = KVCache.create(cfg.num_hidden_layers, 4, 16,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        ref, _ = _jfwd(params, tokens, cache, specs=specs, cfg=cfg)

        mesh = make_mesh((4, 2))
        sparams = shard_decoder_params(params, mesh)
        stokens = jax.device_put(
            tokens, NamedSharding(mesh, P("data", None)))
        scache = shard_kv_cache(
            KVCache.create(cfg.num_hidden_layers, 4, 16,
                           cfg.num_key_value_heads, cfg.head_dim_,
                           jnp.bfloat16), mesh)
        got, _ = _jfwd(sparams, stokens, scache, specs=specs, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(got, np.float32),
            rtol=1e-2, atol=1e-2)

    def test_w4_tp(self):
        """Packed int4 weights shard correctly too."""
        cfg = tiny_cfg()
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=4, a_bit=4))
        params = init_decoder_params(jax.random.PRNGKey(3), cfg, specs)
        tokens = jnp.ones((1, 4), jnp.int32)
        def run(p, c):
            return _jfwd(p, tokens, c, specs=specs, cfg=cfg)[0]
        cache = lambda: KVCache.create(cfg.num_hidden_layers, 1, 8,
                                       cfg.num_key_value_heads, cfg.head_dim_,
                                       jnp.bfloat16)
        ref = run(params, cache())
        mesh = make_mesh((1, 8))
        got = run(shard_decoder_params(params, mesh),
                  shard_kv_cache(cache(), mesh))
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(got, np.float32),
                                   rtol=1e-2, atol=1e-2)
