"""Tail-staged decode writes for the head-major flash cache.

KVCache(tail_r=R) stages single-token decode writes in a token-major
tail buffer and flushes into the head-major main cache every R steps
(layers.py KVCache docstring, PROFILE_r02.md "In-model integration").
These tests drive decode PAST the flush boundary (n_steps > R) and
assert (a) cache-level equivalence of the staged write path vs direct
head-major writes, and (b) model-level equivalence of the tail-attending
flash kernel vs the unstaged flash path and the XLA path, on loop and
scan param layouts, bf16 + int8 KV.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params, \
    stack_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from tests.test_flash_decode import run_steps


class TestTailCacheUnit:
    @pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8])
    def test_staged_writes_match_direct(self, kv_dtype):
        """Prefill + 2R+3 single-token writes through the tail ==
        the same writes direct into a head-major cache (bit-identical:
        tail slots hold the quantized values the direct write would
        produce, and the flush is a pure relayout)."""
        L, B, S, H, D, R, P = 2, 3, 32, 2, 8, 4, 5
        mk = lambda r: KVCache.create(L, B, S, H, D, kv_dtype,
                                      head_major=True, tail_r=r)
        tail, ref = mk(R), mk(0)
        key = jax.random.PRNGKey(0)
        kp = jax.random.normal(key, (B, P, H, D))
        for i in range(L):
            tail = tail.update_layer(i, kp, 2 * kp)
            ref = ref.update_layer(i, kp, 2 * kp)
        tail, ref = tail.advance(P), ref.advance(P)
        for t in range(2 * R + 3):
            kt = jax.random.normal(jax.random.PRNGKey(10 + t), (B, 1, H, D))
            for i in range(L):
                tail = tail.update_layer(i, kt, -kt)
                ref = ref.update_layer(i, kt, -kt)
            tail, ref = tail.advance(1), ref.advance(1)
        n = int(ref.length)
        assert n == P + 2 * R + 3
        # logical contents: main[:, :, :main_len] ++ tail[:tail_len]
        tl = int(tail.tail_len)
        assert tl == (2 * R + 3) % R or tl == R
        main_len = n - tl
        np.testing.assert_array_equal(
            np.asarray(tail.k[:, :, :, :main_len]),
            np.asarray(ref.k[:, :, :, :main_len]))
        # tail tokens: transpose to head-major and compare to ref suffix
        t_hm = jnp.transpose(tail.k_tail[:, :tl], (0, 3, 2, 1, 4))
        np.testing.assert_array_equal(
            np.asarray(t_hm.astype(ref.k.dtype)),
            np.asarray(ref.k[:, :, :, main_len:n]))
        if kv_dtype == jnp.int8:
            np.testing.assert_array_equal(
                np.asarray(tail.k_scale[:, :, :, :main_len]),
                np.asarray(ref.k_scale[:, :, :, :main_len]))
            # tail scales are [L, B, R, n_kv] -> head-major [L, n_kv, B, R]
            ts_hm = jnp.transpose(tail.kt_scale[:, :, :tl], (0, 3, 1, 2))
            np.testing.assert_array_equal(
                np.asarray(ts_hm), np.asarray(ref.k_scale[:, :, :, main_len:n]))

    def test_tail_requires_head_major(self):
        with pytest.raises(ValueError):
            KVCache.create(1, 2, 8, 2, 4, jnp.int8, tail_r=4)


def _tiny():
    cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    specs = dataclasses.replace(specs, attn_impl="flash")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    return cfg, specs, params


class TestForwardTail:
    @pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
    def test_tail_matches_unstaged_flash(self, kv_dtype):
        """Decode through two flush boundaries: tail-staged flash ==
        unstaged flash == XLA path."""
        cfg, specs, params = _tiny()
        B, T, S, R = 2, 8, 64, 4
        tokens = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        mk = lambda hm_, r: KVCache.create(
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.dtype(kv_dtype), head_major=hm_, tail_r=r)
        n = 2 * R + 2                      # crosses the flush twice
        got = run_steps(params, cfg, specs, mk(True, R), tokens, n)
        ref = run_steps(params, cfg, specs, mk(True, 0), tokens, n)
        xla = run_steps(params, cfg,
                        dataclasses.replace(specs, attn_impl="xla"),
                        mk(False, 0), tokens, n)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
        np.testing.assert_allclose(got, xla, rtol=6e-2, atol=6e-2)

    def test_tail_scan_matches_loop(self):
        """Stacked (lax.scan) params stage tail writes in the carry and
        match the python-loop path across flush boundaries."""
        cfg, specs, params = _tiny()
        B, T, S, R = 2, 4, 32, 4
        tokens = jnp.ones((B, T), jnp.int32)
        mk = lambda: KVCache.create(
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.int8, head_major=True, tail_r=R)
        n = R + 3
        ref = run_steps(params, cfg, specs, mk(), tokens, n)
        got = run_steps(stack_decoder_params(params), cfg, specs, mk(),
                        tokens, n)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)

    def test_tail_rejects_slot_mode(self):
        cfg, specs, params = _tiny()
        cache = KVCache.create(
            cfg.num_hidden_layers, 2, 32, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.int8, head_major=True, tail_r=4)
        with pytest.raises(NotImplementedError):
            forward(params, jnp.ones((2, 1), jnp.int32), cache, specs=specs,
                    cfg=cfg, slot_lengths=jnp.zeros((2,), jnp.int32))


class TestTailSharding:
    def test_shard_tail_cache(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from jax.sharding import PartitionSpec as P

        from mixq_tpu.parallel import make_mesh, shard_kv_cache

        cache = KVCache.create(2, 4, 16, 4, 32, jnp.int8, head_major=True,
                               tail_r=4)
        sc = shard_kv_cache(cache, make_mesh((2, 4)))
        assert sc.k_tail.sharding.spec == P(None, None, "data", "model", None)
        assert sc.kt_scale.sharding.spec == P(None, "data", None, "model")


class TestEngineTail:
    def test_engine_decodes_past_flush(self):
        """Engine flash path (tail_r=DEFAULT_TAIL_R) generates past the
        flush boundary and matches the XLA engine token-for-token."""
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine import InferenceEngine
        from mixq_tpu.ops.pallas.flash_decode import DEFAULT_TAIL_R

        cfg, specs, params = _tiny()
        ecfg = EngineConfig(max_seq_len=64, prefill_chunk=8, kv_dtype="int8")
        eng_f = InferenceEngine(params, cfg, specs, ecfg)
        eng_x = InferenceEngine(
            params, cfg, dataclasses.replace(specs, attn_impl="xla"), ecfg)
        assert eng_f.new_cache(2).k_tail is not None
        prompts = [[1, 5, 9, 4], [2, 2, 7]]
        n_new = DEFAULT_TAIL_R + 4
        ref = eng_x.generate(prompts, max_new_tokens=n_new)
        got = eng_f.generate(prompts, max_new_tokens=n_new)
        assert got == ref
