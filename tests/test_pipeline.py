"""Pipeline parallelism (parallel/pipeline.py): GPipe-style microbatched
inference must match the single-device forward exactly — prefill AND the
decode steps that consume the pipelined cache. SURVEY §2.8's PP row;
TP+DP stay the first-choice strategy (PARITY.md §Parallelism)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.parallel.pipeline import (pipeline_forward, shard_stage_params,
                                        stage_params)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices")


def make_mesh(n=4, axis="pipe"):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), (axis,))


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny(num_hidden_layers=4)
    return cfg, init_decoder_params(jax.random.PRNGKey(0), cfg)


def _run_pair(cfg, params, specs, B=8, Tp=8, decode_steps=3, M=None,
              kv_dtype=jnp.bfloat16):
    """(single-device logits...) vs (pipelined logits...) for a prefill
    chunk + chained decode steps."""
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, Tp), 0,
                              cfg.vocab_size, dtype=jnp.int32)
    mesh = make_mesh()

    cache_r = KVCache.create(cfg.num_hidden_layers, B, 32,
                             cfg.num_key_value_heads, cfg.head_dim_,
                             dtype=kv_dtype)
    ref_logits, cache_r = forward(params, toks, cache_r, specs, cfg)
    refs = [ref_logits]
    nxt = jnp.argmax(ref_logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
    for _ in range(decode_steps):
        lg, cache_r = forward(params, nxt, cache_r, specs, cfg)
        refs.append(lg)
        nxt = jnp.argmax(lg[:, -1], axis=-1)[:, None].astype(jnp.int32)

    sp = shard_stage_params(stage_params(params, 4), mesh)
    cache_p = KVCache.create(cfg.num_hidden_layers, B, 32,
                             cfg.num_key_value_heads, cfg.head_dim_,
                             dtype=kv_dtype)
    got_logits, cache_p = pipeline_forward(sp, toks, cache_p, specs, cfg,
                                           mesh=mesh, microbatches=M)
    gots = [got_logits]
    nxt = jnp.argmax(got_logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
    for _ in range(decode_steps):
        lg, cache_p = pipeline_forward(sp, nxt, cache_p, specs, cfg,
                                       mesh=mesh, microbatches=M)
        gots.append(lg)
        nxt = jnp.argmax(lg[:, -1], axis=-1)[:, None].astype(jnp.int32)
    return refs, gots


class TestPipelineParity:
    def test_fp16_prefill_and_decode(self, model):
        cfg, params = model
        refs, gots = _run_pair(cfg, params, DecoderSpecs.fp16())
        for r, g in zip(refs, gots):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-2, atol=2e-2)
        # greedy tokens must agree exactly step for step
        for r, g in zip(refs, gots):
            assert np.array_equal(np.argmax(np.asarray(r)[:, -1], -1),
                                  np.argmax(np.asarray(g)[:, -1], -1))

    def test_w8a8_parity(self, model):
        cfg, params_fp = model
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(2), cfg, specs)
        refs, gots = _run_pair(cfg, params, specs)
        for r, g in zip(refs, gots):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-2, atol=2e-2)

    def test_microbatch_count_immaterial(self, model):
        """M=4 and M=8 microbatchings must produce identical logits (the
        schedule changes, the math must not)."""
        cfg, params = model
        _, g4 = _run_pair(cfg, params, DecoderSpecs.fp16(), M=4,
                          decode_steps=1)
        _, g8 = _run_pair(cfg, params, DecoderSpecs.fp16(), M=8,
                          decode_steps=1)
        for a, b in zip(g4, g8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_int8_kv_parity(self, model):
        """int8-KV pipeline (VERDICT r3 item 8: PP must serve the shipped
        serving default) matches the single-device int8-KV forward."""
        cfg, params_fp = model
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(2), cfg, specs)
        refs, gots = _run_pair(cfg, params, specs, kv_dtype=jnp.int8)
        for r, g in zip(refs, gots):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-2, atol=2e-2)
        for r, g in zip(refs, gots):
            assert np.array_equal(np.argmax(np.asarray(r)[:, -1], -1),
                                  np.argmax(np.asarray(g)[:, -1], -1))

    def test_unsupported_scopes_raise(self, model):
        cfg, params = model
        mesh = make_mesh()
        sp = shard_stage_params(stage_params(params, 4), mesh)
        cache_hm = KVCache.create(cfg.num_hidden_layers, 8, 32,
                                  cfg.num_key_value_heads, cfg.head_dim_,
                                  dtype=jnp.int8, head_major=True)
        toks = jnp.ones((8, 4), jnp.int32)
        with pytest.raises(NotImplementedError, match="head-major"):
            pipeline_forward(sp, toks, cache_hm, DecoderSpecs.fp16(), cfg,
                             mesh=mesh)
