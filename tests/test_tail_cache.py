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
        """Prefill (not R-aligned) + 2R+3 single-token writes staged in
        the tail with full-window flushes: after every flush the main
        cache's flushed prefix is bit-identical to direct head-major
        writes, and the still-staged suffix lives in the tail slots."""
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
        assert int(tail.tail_base) == P
        for t in range(1, 2 * R + 4):
            kt = jax.random.normal(jax.random.PRNGKey(10 + t), (B, 1, H, D))
            for i in range(L):
                tail = tail.update_layer(i, kt, -kt)
                ref = ref.update_layer(i, kt, -kt)
            tail, ref = tail.advance(1), ref.advance(1)
            # the staged suffix is in the tail at its window slots
            slot = (t - 1) % R
            t_hm = jnp.moveaxis(tail.k_tail[:, slot], 2, 1)   # [L,H,B,D]
            np.testing.assert_array_equal(
                np.asarray(t_hm.astype(ref.k.dtype)),
                np.asarray(ref.k[:, :, :, int(ref.length) - 1]))
            if t % R == 0:
                tail = tail.flush_tail()
            base = int(tail.tail_base)
            assert base == P + (t // R) * R
            # flushed prefix bit-identical to direct writes
            np.testing.assert_array_equal(
                np.asarray(tail.k[:, :, :, :base]),
                np.asarray(ref.k[:, :, :, :base]))
            np.testing.assert_array_equal(
                np.asarray(tail.v[:, :, :, :base]),
                np.asarray(ref.v[:, :, :, :base]))
            if kv_dtype == jnp.int8:
                np.testing.assert_array_equal(
                    np.asarray(tail.k_scale[:, :, :, :base]),
                    np.asarray(ref.k_scale[:, :, :, :base]))
        assert int(ref.length) == P + 2 * R + 3

    def test_tail_requires_head_major(self):
        with pytest.raises(ValueError):
            KVCache.create(1, 2, 8, 2, 4, jnp.int8, tail_r=4)


def _tiny():
    cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    specs = dataclasses.replace(specs, attn_impl="flash")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    return cfg, specs, params


def run_steps_flushing(params, cfg, specs, cache, tokens, n_steps):
    """run_steps with the engine's flush contract: flush_tail after every
    full R-window of decode steps (tail caches only)."""
    jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))
    jflush = jax.jit(lambda c: c.flush_tail())
    logits, cache = jfwd(params, tokens, cache, specs=specs, cfg=cfg)
    outs = [logits[:, -1]]
    B, _ = tokens.shape
    R = cache.k_tail.shape[1] if cache.k_tail is not None else 0
    for i in range(n_steps):
        nxt = jnp.full((B,), 7 + 3 * i, jnp.int32)
        logits, cache = jfwd(params, nxt[:, None], cache, specs=specs,
                             cfg=cfg)
        if R and (i + 1) % R == 0:
            cache = jflush(cache)
        outs.append(logits[:, -1])
    return np.asarray(jnp.stack(outs), np.float32)


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
        got = run_steps_flushing(params, cfg, specs, mk(True, R), tokens, n)
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
        ref = run_steps_flushing(params, cfg, specs, mk(), tokens, n)
        got = run_steps_flushing(stack_decoder_params(params), cfg, specs,
                                 mk(), tokens, n)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)

    def test_slot_mode_requires_per_row_windows(self):
        """Slot-mode decode on a tail cache with a SCALAR tail_base (a
        uniform-engine cache) must be rejected — pools allocate
        per_row_tail=True."""
        cfg, specs, params = _tiny()
        cache = KVCache.create(
            cfg.num_hidden_layers, 2, 32, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.int8, head_major=True, tail_r=4)
        with pytest.raises(ValueError, match="per_row_tail"):
            forward(params, jnp.ones((2, 1), jnp.int32), cache, specs=specs,
                    cfg=cfg, slot_lengths=jnp.zeros((2,), jnp.int32))


class TestSlotTail:
    """Per-row tail windows for the continuous-batching (slot-mode) pool:
    each row stages decode tokens at (length - tail_base[b]) % R and the
    engine flushes all rows' windows every R global steps."""

    @pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8])
    def test_per_row_staging_and_flush_match_direct(self, kv_dtype):
        """Rows at DIFFERENT lengths: staged writes + per-row flush give
        a main cache bit-identical (per row, up to that row's window
        base) to direct slot-mode writes."""
        L, B, S, H, D, R = 2, 3, 32, 2, 8, 4
        lengths = np.asarray([0, 3, 5])        # staggered starting points
        tail = KVCache.create(L, B, S, H, D, kv_dtype, head_major=True,
                              tail_r=R, per_row_tail=True)
        tail = tail._replace(tail_base=jnp.asarray(lengths, jnp.int32))
        ref = KVCache.create(L, B, S, H, D, kv_dtype, head_major=True)
        for t in range(1, 2 * R + 4):
            kt = jax.random.normal(jax.random.PRNGKey(t), (B, 1, H, D))
            sl = jnp.asarray(lengths, jnp.int32)
            for i in range(L):
                tail = tail.update_layer_slots(i, kt, -kt, sl)
                ref = ref.update_layer_slots(i, kt, -kt, sl)
            # the staged token sits at each row's own window slot
            slots = (lengths - np.asarray(tail.tail_base)) % R
            for b in range(B):
                got = tail.k_tail[:, slots[b], b]      # [L, H, D]
                np.testing.assert_array_equal(
                    np.asarray(got.astype(ref.k.dtype)),
                    np.asarray(ref.k[:, :, b, lengths[b]]))
            lengths = lengths + 1
            if t % R == 0:
                tail = tail.flush_tail(jnp.asarray(lengths, jnp.int32))
                np.testing.assert_array_equal(np.asarray(tail.tail_base),
                                              lengths)
            for b in range(B):
                base = int(tail.tail_base[b])
                np.testing.assert_array_equal(
                    np.asarray(tail.k[:, :, b, :base]),
                    np.asarray(ref.k[:, :, b, :base]))
                np.testing.assert_array_equal(
                    np.asarray(tail.v[:, :, b, :base]),
                    np.asarray(ref.v[:, :, b, :base]))
                if kv_dtype == jnp.int8:
                    np.testing.assert_array_equal(
                        np.asarray(tail.k_scale[:, :, b, :base]),
                        np.asarray(ref.k_scale[:, :, b, :base]))

    @pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8])
    def test_layered_flush_matches_fused(self, kv_dtype, monkeypatch):
        """MIXQ_FLUSH_LAYERED=1 (the per-layer scatter that caps the
        whole-cache relayout temp — PROFILE_r05 §2.3) is bit-identical
        to the fused whole-cache scatter, including drop-mode rows near
        max_seq and quantized scales."""
        L, B, S, H, D, R = 3, 4, 16, 2, 8, 4
        lengths = np.asarray([0, 3, S - 2, 5])   # one row overflows S
        base = jnp.asarray(lengths, jnp.int32)
        tail = KVCache.create(L, B, S, H, D, kv_dtype, head_major=True,
                              tail_r=R, per_row_tail=True)
        tail = tail._replace(tail_base=base)
        sl = jnp.asarray(lengths, jnp.int32)
        for t in range(R):
            kt = jax.random.normal(jax.random.PRNGKey(t), (B, 1, H, D))
            for i in range(L):
                tail = tail.update_layer_slots(i, kt, 2 * kt, sl)
            sl = sl + 1
        monkeypatch.setenv("MIXQ_FLUSH_LAYERED", "0")
        fused = tail.flush_tail(sl)
        monkeypatch.setenv("MIXQ_FLUSH_LAYERED", "1")
        layered = tail.flush_tail(sl)
        for name in ("k", "v", "k_scale", "v_scale", "tail_base"):
            a, b = getattr(fused, name), getattr(layered, name)
            if a is None:
                continue
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    def test_partial_window_flush_resets_cleanly(self):
        """A flush mid-window (a row joined late) lands staged tokens at
        their positions, advances tail_base to the row's length, and
        later staging restarts at slot 0."""
        L, B, S, H, D, R = 1, 2, 16, 2, 8, 4
        tail = KVCache.create(L, B, S, H, D, jnp.bfloat16, head_major=True,
                              tail_r=R, per_row_tail=True)
        k1 = jax.random.normal(jax.random.PRNGKey(1), (B, 1, H, D))
        sl = jnp.asarray([0, 2], jnp.int32)
        tail = tail.update_layer_slots(0, k1, k1, sl)
        tail = tail.flush_tail(sl + 1)         # only 1 token staged
        np.testing.assert_array_equal(np.asarray(tail.tail_base), [1, 3])
        np.testing.assert_array_equal(
            np.asarray(tail.k[0, :, 0, 0]),
            np.asarray(jnp.moveaxis(k1[0, 0], 0, 0).astype(tail.k.dtype)))
        # next staging goes to slot 0 of the new window
        k2 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H, D))
        tail = tail.update_layer_slots(0, k2, k2, sl + 1)
        np.testing.assert_array_equal(
            np.asarray(tail.k_tail[0, 0, 0]),
            np.asarray(k2[0, 0].astype(tail.k_tail.dtype)))

    @pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
    def test_forward_slot_tail_matches_unstaged(self, kv_dtype):
        """Slot-mode decode through two flush boundaries: per-row
        tail-staged flash == unstaged flash slot writes == XLA slots."""
        from tests.test_flash_decode import run_steps

        cfg, specs, params = _tiny()
        B, T, S, R = 2, 8, 64, 4
        tokens = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        mk = lambda hm_, r: KVCache.create(
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.dtype(kv_dtype), head_major=hm_, tail_r=r,
            per_row_tail=bool(r))
        n = 2 * R + 2

        jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))
        jflush = jax.jit(lambda c, rl: c.flush_tail(rl))

        def run_slots(cache, flush):
            logits, cache = jfwd(params, tokens, cache, specs=specs, cfg=cfg)
            outs = [logits[:, -1]]
            for i in range(n):
                nxt = jnp.full((B, 1), 7 + 3 * i, jnp.int32)
                sl = jnp.full((B,), T + i, jnp.int32)
                logits, cache = jfwd(params, nxt, cache, specs=specs,
                                     cfg=cfg, slot_lengths=sl)
                cache = cache.advance(1)
                if flush and (i + 1) % R == 0:
                    cache = jflush(cache, sl + 1)
                outs.append(logits[:, -1])
            return np.asarray(jnp.stack(outs), np.float32)

        got = run_slots(mk(True, R), True)
        ref = run_slots(mk(True, 0), False)
        xla = run_steps(params, cfg,
                        dataclasses.replace(specs, attn_impl="xla"),
                        mk(False, 0), tokens, n, slot_mode=True)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
        np.testing.assert_allclose(got, xla, rtol=6e-2, atol=6e-2)


class TestCBEngineTail:
    """Continuous-batching pool over a tail-staged flash cache."""

    def _engine(self, n_slots=3, max_seq=64):
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine.batching import ContinuousBatchingEngine

        cfg, specs, params = _tiny()
        return ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=n_slots, max_seq_len=max_seq,
                         prefill_chunk=8, kv_dtype="int8"))

    def test_pool_allocates_per_row_tail(self):
        eng = self._engine()
        assert eng.cache.head_major
        assert eng.cache.k_tail is not None
        assert eng.cache.tail_base.shape == (eng.n_slots,)

    def test_staggered_slot_reuse_past_flush(self):
        """More requests than slots, staggered arrivals, decode lengths
        crossing several window boundaries: all requests complete with
        the right token counts and the run is deterministic."""
        from mixq_tpu.ops.pallas.flash_decode import DEFAULT_TAIL_R

        n_new = 2 * DEFAULT_TAIL_R + 3
        results = []
        for _ in range(2):
            eng = self._engine(n_slots=2)
            prompts = [[3, 1, 4, 1, 5], [2, 7], [9], [8, 2, 8, 1]]
            ids = [eng.add_request(p, n_new) for p in prompts[:3]]
            for _ in range(3):
                eng.step()
            ids.append(eng.add_request(prompts[3], n_new))
            out = eng.run_to_completion()
            assert set(out) == set(ids)
            assert all(len(v) == n_new for v in out.values())
            results.append([out[r] for r in ids])
        assert results[0] == results[1]
        # windows actually flushed (bases advanced past the prompts)
        assert int(np.asarray(eng.cache.tail_base).max()) > DEFAULT_TAIL_R


class TestSlidingWindowFlash:
    """Sliding-window (mistral-family) decode on the head-major flash
    cache: the kernel windows via its per-row start offset
    (kv_len - W) instead of the batch-major path's ring reclaim."""

    def _mistral(self, window):
        cfg = ModelConfig.tiny(model_type="mistral", sliding_window=window,
                               num_key_value_heads=4, intermediate_size=128)
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        return cfg, specs, params

    @pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
    def test_flash_window_matches_ring_xla(self, kv_dtype):
        """Decode PAST the window on the flash cache (tail-staged) must
        match the ring-reclaim XLA path attending the same positions."""
        W = 16
        cfg, specs, params = self._mistral(W)
        B, T, R = 2, 8, 4
        tokens = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        n = 14                        # kv_len reaches 22 > W
        hm_cache = KVCache.create(
            cfg.num_hidden_layers, B, 64, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.dtype(kv_dtype), head_major=True, tail_r=R)
        ring_cache = KVCache.create(
            cfg.num_hidden_layers, B, 32, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.dtype(kv_dtype))
        got = run_steps_flushing(params, cfg, specs, hm_cache, tokens, n)
        ref = run_steps(params, cfg,
                        dataclasses.replace(specs, attn_impl="xla"),
                        ring_cache, tokens, n)
        np.testing.assert_allclose(got, ref, rtol=6e-2, atol=6e-2)

    def test_gate_policy(self):
        from mixq_tpu.ops.pallas.flash_decode import use_head_major_cache

        cfg, _, _ = self._mistral(16)
        assert not use_head_major_cache("auto", cfg, 256, 1)
        assert use_head_major_cache("flash", cfg, 256, 1)

    def test_window_must_exceed_tail_depth(self):
        cfg, specs, params = self._mistral(4)   # W=4 <= R=4
        cache = KVCache.create(
            cfg.num_hidden_layers, 2, 64, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.int8, head_major=True, tail_r=4)
        with pytest.raises(ValueError, match="sliding_window"):
            forward(params, jnp.ones((2, 1), jnp.int32), cache,
                    specs=dataclasses.replace(specs, attn_impl="flash"),
                    cfg=cfg)

    def test_engine_serves_mistral_flash(self):
        """InferenceEngine with the flash opt-in generates on a
        sliding-window model (windowing in the kernel, no ring)."""
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine import InferenceEngine

        W = 16
        cfg, specs, params = self._mistral(W)
        fspecs = dataclasses.replace(specs, attn_impl="flash")
        ecfg = EngineConfig(max_seq_len=64, prefill_chunk=8,
                            kv_dtype="int8")
        eng = InferenceEngine(params, cfg, fspecs, ecfg)
        assert eng.new_cache(2).head_major
        out = eng.generate([[1, 5, 9, 4], [2, 2, 7]], max_new_tokens=20)
        assert [len(r) for r in out] == [20, 20]


class TestAlibiFlash:
    """ALiBi (Baichuan-13B / falcon-alibi family) decode on the head-major
    flash cache: slopes baked into the kernel as config constants."""

    def _alibi_model(self):
        cfg = ModelConfig.tiny(alibi=True, rope_style="none",
                               num_key_value_heads=4, intermediate_size=128)
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        specs = dataclasses.replace(specs, attn_impl="flash")
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        return cfg, specs, params

    @pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
    def test_flash_alibi_matches_xla(self, kv_dtype):
        """Decode through a flush boundary: flash+tail ALiBi == the
        batch-major XLA additive-bias path."""
        from tests.test_flash_decode import run_steps

        cfg, specs, params = self._alibi_model()
        B, T, S, R = 2, 8, 64, 4
        tokens = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        n = R + 3
        hm_cache = KVCache.create(
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.dtype(kv_dtype), head_major=True, tail_r=R)
        xla_cache = KVCache.create(
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.dtype(kv_dtype))
        got = run_steps_flushing(params, cfg, specs, hm_cache, tokens, n)
        ref = run_steps(params, cfg,
                        dataclasses.replace(specs, attn_impl="xla"),
                        xla_cache, tokens, n)
        np.testing.assert_allclose(got, ref, rtol=6e-2, atol=6e-2)


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
    """Tail-staged engine plumbing. Token-exact generate equality vs the
    no-tail engine is deliberately NOT asserted: tail tokens take the
    kernel's bf16 path while flushed tokens take the int8-MXU path, so
    logits differ at the ~1e-3 level and greedy feedback can flip
    near-tie argmaxes (run_steps docstring). Logits proximity is
    asserted on fixed-token sequences instead."""

    def test_stepwise_flush_cadence_matches_no_tail(self):
        """Fixed-token decode through the engine's stepwise API with
        flush_if_due every step: logits track the tail-less engine
        across two window boundaries."""
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine import InferenceEngine
        from mixq_tpu.ops.pallas.flash_decode import DEFAULT_TAIL_R

        cfg, specs, params = _tiny()
        ecfg = EngineConfig(max_seq_len=64, prefill_chunk=8, kv_dtype="int8")
        eng = InferenceEngine(params, cfg, specs, ecfg)
        B = 2
        ct = eng.new_cache(B)
        cn = eng.new_cache(B)._replace(
            k_tail=None, v_tail=None, kt_scale=None, vt_scale=None,
            tail_base=None)
        assert ct.k_tail is not None
        toks = jnp.ones((B, 8), jnp.int32)
        lt, ct = eng.prefill(toks, ct)
        ln, cn = eng.prefill(toks, cn)
        for i in range(1, 2 * DEFAULT_TAIL_R + 4):
            nxt = jnp.full((B, 1), 3 + 5 * i, jnp.int32)
            lt, ct = eng.decode_step(nxt, ct)
            ln, cn = eng.decode_step(nxt, cn)
            ct = eng.flush_if_due(ct, i)
            np.testing.assert_allclose(np.float32(lt), np.float32(ln),
                                       rtol=3e-2, atol=3e-2)
        assert int(ct.tail_base) > 8      # windows actually flushed

    def test_device_loop_generates_past_window_boundary(self):
        """The window-chunked device decode loop runs a tail cache past
        two window boundaries and matches the stepwise path's output
        shape/EOS handling."""
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine import InferenceEngine
        from mixq_tpu.ops.pallas.flash_decode import DEFAULT_TAIL_R

        cfg, specs, params = _tiny()
        n_new = 2 * DEFAULT_TAIL_R + 4
        outs = []
        for dev in (False, True):
            ecfg = EngineConfig(max_seq_len=64, prefill_chunk=8,
                                kv_dtype="int8", device_decode_loop=dev)
            eng = InferenceEngine(params, cfg, specs, ecfg)
            outs.append(eng.generate([[1, 5, 9, 4], [2, 2, 7]],
                                     max_new_tokens=n_new))
        assert [len(r) for r in outs[0]] == [n_new, n_new]
        # identical sampling path + same numerics within each engine:
        # stepwise and device-loop paths must agree exactly
        assert outs[0] == outs[1]
