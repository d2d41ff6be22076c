"""Llama-2-70B / Llama-3-style structural validation: GQA decoder with the
70B sharding pattern (8 kv heads TP-sharded over the model axis, row/col
parallel linears) compiles and runs on the virtual 8-device mesh, plus the
continuous-batching engine over a mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine.batching import ContinuousBatchingEngine
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.parallel import make_mesh, shard_decoder_params, shard_kv_cache

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def llama70b_tiny() -> ModelConfig:
    """70B proportions at toy width: 64 q heads -> 8, 8 kv heads (GQA 8:1),
    80 layers -> 4; all divisible by tp=8 like the real 70B."""
    return ModelConfig(
        model_type="llama", vocab_size=512, hidden_size=128,
        intermediate_size=256, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=8, head_dim=16,
    )


_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


class Test70BStructure:
    def test_tp8_gqa_matches_single(self):
        cfg = llama70b_tiny()
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        tokens = jnp.ones((2, 8), jnp.int32)

        def run(p, c):
            return _jfwd(p, tokens, c, specs=specs, cfg=cfg)[0]

        def cache():
            return KVCache.create(cfg.num_hidden_layers, 2, 16,
                                  cfg.num_key_value_heads, cfg.head_dim_,
                                  jnp.int8)
        ref = run(params, cache())
        mesh = make_mesh((1, 8))
        got = run(shard_decoder_params(params, mesh),
                  shard_kv_cache(cache(), mesh))
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(got, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_continuous_batching_over_mesh(self):
        cfg = llama70b_tiny()
        specs = DecoderSpecs.fp16()
        params = init_decoder_params(jax.random.PRNGKey(1), cfg, specs)
        mesh = make_mesh((1, 8))
        eng_ref = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=2, max_seq_len=32, prefill_chunk=8))
        eng_tp = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=2, max_seq_len=32, prefill_chunk=8),
            mesh=mesh)
        prompts = [[1, 2, 3], [4, 5, 6, 7]]
        ids_r = [eng_ref.add_request(p, 5) for p in prompts]
        ids_t = [eng_tp.add_request(p, 5) for p in prompts]
        out_r = eng_ref.run_to_completion()
        out_t = eng_tp.run_to_completion()
        assert [out_r[i] for i in ids_r] == [out_t[i] for i in ids_t]

    def test_continuous_batching_flash_over_mesh(self):
        """Meshed CB pool on the head-major flash cache: the pallas call
        runs under shard_map (flash_decode_sharded) — (dp x tp) shards
        each attend their own rows x kv-heads block; windowed decode +
        per-row tail flush ride GSPMD. Greedy tokens must match the
        single-device flash engine."""
        import dataclasses

        cfg = llama70b_tiny()
        specs = dataclasses.replace(
            DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8)),
            attn_impl="flash")
        params = init_decoder_params(jax.random.PRNGKey(2), cfg, specs)
        mesh = make_mesh((2, 4))
        ecfg = EngineConfig(max_batch_size=2, max_seq_len=32,
                            prefill_chunk=8, kv_dtype="int8")
        eng_ref = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        eng_tp = ContinuousBatchingEngine(params, cfg, specs, ecfg,
                                          mesh=mesh)
        assert eng_tp.cache.head_major and eng_tp.cache.k_tail is not None
        prompts = [[1, 2, 3], [4, 5, 6, 7]]
        ids_r = [eng_ref.add_request(p, 10) for p in prompts]
        ids_t = [eng_tp.add_request(p, 10) for p in prompts]
        out_r = eng_ref.run_to_completion()
        out_t = eng_tp.run_to_completion()
        assert [out_r[i] for i in ids_r] == [out_t[i] for i in ids_t]
