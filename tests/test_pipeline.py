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

    def test_slot_mode_parity(self, model):
        """Slot-mode (continuous batching) decode through the pipeline:
        per-row positions, per-row rope, per-row KV scatter — matches
        the single-device slot-mode forward step for step, int8 KV
        (gives PP a serving story — VERDICT r4 item 7)."""
        cfg, _ = model
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(2), cfg, specs)
        B, S = 8, 32
        mesh = make_mesh()
        sp = shard_stage_params(stage_params(params, 4), mesh)
        mk = lambda: KVCache.create(cfg.num_hidden_layers, B, S,
                                    cfg.num_key_value_heads, cfg.head_dim_,
                                    dtype=jnp.int8)
        cache_r, cache_p = mk(), mk()
        lengths = jnp.asarray(np.arange(B) % 4, jnp.int32)  # staggered rows
        tok = jax.random.randint(jax.random.PRNGKey(7), (B, 1), 0,
                                 cfg.vocab_size, dtype=jnp.int32)
        for _ in range(3):
            lr, cache_r = forward(params, tok, cache_r, specs, cfg,
                                  slot_lengths=lengths)
            lp, cache_p = pipeline_forward(sp, tok, cache_p, specs, cfg,
                                           mesh=mesh, slot_lengths=lengths)
            np.testing.assert_allclose(np.asarray(lp), np.asarray(lr),
                                       rtol=2e-2, atol=2e-2)
            assert np.array_equal(np.argmax(np.asarray(lr)[:, -1], -1),
                                  np.argmax(np.asarray(lp)[:, -1], -1))
            tok = jnp.argmax(lr[:, -1], -1)[:, None].astype(jnp.int32)
            lengths = lengths + 1

    def test_pp_serving_engine_matches_single(self, model):
        """The CB serving engine over a pipe mesh (EngineConfig.
        pipe_stages — r5 item 7: PP's serving story): admission prefill,
        slot-mode decode windows and slot churn all route through
        pipeline_forward, token-equal to the single-device engine."""
        import dataclasses

        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine.batching import ContinuousBatchingEngine

        from mixq_tpu.config import QuantConfig
        from mixq_tpu.quantize import quantize_model
        from mixq_tpu.utils.substrate import make_markov_state
        from mixq_tpu.utils.testing import DictSource

        cfg, _ = model
        # Markov substrate: decisive (high-margin) argmax, so token
        # equality is robust to the microbatching's float-tie noise
        state, succ = make_markov_state(cfg, v_eff=min(
            32, cfg.hidden_size, cfg.vocab_size), seed=0, mean_cycle=8)
        params, specs = quantize_model(DictSource(state), cfg,
                                       QuantConfig.w8a8())
        ecfg = EngineConfig(max_batch_size=4, max_seq_len=32,
                            prefill_chunk=8, kv_dtype="int8")

        def walk(start, n):
            out = [int(start)]
            for _ in range(n - 1):
                out.append(int(succ[out[-1]]))
            return out

        prompts = [walk(2 + i, 3 + i % 3) for i in range(5)]  # churn: 5/4

        ref_eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        ids_r = [ref_eng.add_request(p, 6) for p in prompts]
        out_r = ref_eng.run_to_completion()

        pp_eng = ContinuousBatchingEngine(
            params, cfg, specs,
            dataclasses.replace(ecfg, pipe_stages=4), mesh=make_mesh())
        assert not pp_eng.cache.head_major
        ids_p = [pp_eng.add_request(p, 6) for p in prompts]
        out_p = pp_eng.run_to_completion()
        assert [out_r[i] for i in ids_r] == [out_p[i] for i in ids_p]

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
