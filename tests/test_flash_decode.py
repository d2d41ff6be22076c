"""Flash-decode kernel (ops/pallas/flash_decode.py) + head-major KV cache:
kernel vs attend() reference (interpret mode on CPU), forward() and engine
equality between attn_impl='flash' (head-major cache) and the default XLA
path. Covers bf16 + int8 caches, GQA, per-row lengths, kv_start."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params, \
    stack_decoder_params
from mixq_tpu.models.layers import attend
from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.ops.pallas.flash_decode import flash_decode_attention

INTERP = dict(interpret=True)


def hm(x):
    """[B, S, h, d] -> [h, B, S, d] (and [B,S,h] -> [h,B,S])."""
    return jnp.moveaxis(x, 2, 0)


class TestKernelVsAttend:
    @pytest.mark.parametrize("nq,nkv", [(4, 4), (8, 2)])
    def test_bf16(self, nq, nkv):
        B, S, D = 4, 256, 64
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, nq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, nkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, nkv, D), jnp.float32)
        lengths = jnp.asarray([256, 130, 1, 77], jnp.int32)
        ref = attend(q[:, None].astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), (lengths - 1)[:, None],
                     lengths)[:, 0]
        got = flash_decode_attention(
            q.astype(jnp.bfloat16), hm(k.astype(jnp.bfloat16)),
            hm(v.astype(jnp.bfloat16)), lengths, **INTERP)
        np.testing.assert_allclose(np.float32(got), np.float32(ref),
                                   rtol=3e-2, atol=3e-2)

    def test_int8_native(self):
        """int8 cache consumed natively: matches the xla_int8 math within
        block-quantization tolerance."""
        B, S, nq, nkv, D = 4, 256, 8, 4, 128
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (B, nq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, nkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, nkv, D), jnp.float32)
        lengths = jnp.asarray([200, 64, 3, 256], jnp.int32)
        qk8, sk = Q.quantize_kv(k)
        qv8, sv = Q.quantize_kv(v)
        ref = attend(q[:, None], qk8, qv8, (lengths - 1)[:, None], lengths,
                     k_scale=sk, v_scale=sv)[:, 0]
        got = flash_decode_attention(
            q, hm(qk8), hm(qv8), lengths, k_scale=hm(sk), v_scale=hm(sv),
            **INTERP)
        np.testing.assert_allclose(np.float32(got), np.float32(ref),
                                   rtol=3e-2, atol=3e-2)

    def test_kv_start(self):
        B, S, H, D = 2, 128, 2, 64
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
        lengths = jnp.asarray([100, 128], jnp.int32)
        start = jnp.asarray([7, 0], jnp.int32)
        ref = attend(q[:, None].astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), (lengths - 1)[:, None], lengths,
                     kv_start=start)[:, 0]
        got = flash_decode_attention(
            q.astype(jnp.bfloat16), hm(k.astype(jnp.bfloat16)),
            hm(v.astype(jnp.bfloat16)), lengths, kv_start=start,
            **INTERP)
        np.testing.assert_allclose(np.float32(got), np.float32(ref),
                                   rtol=3e-2, atol=3e-2)

    @pytest.mark.parametrize("nq,nkv", [(4, 4), (8, 2)])
    def test_alibi(self, nq, nkv):
        """Config-derived ALiBi slopes (streamed as a tiny lane-padded
        input) must match attend()'s additive-bias path (per-row
        lengths)."""
        from mixq_tpu.models.layers import alibi_slopes

        B, S, D = 3, 128, 64
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q = jax.random.normal(ks[0], (B, nq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, nkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, nkv, D), jnp.float32)
        lengths = jnp.asarray([128, 40, 7], jnp.int32)
        sl = alibi_slopes(nq)
        ref = attend(q[:, None].astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), (lengths - 1)[:, None], lengths,
                     alibi=sl)[:, 0]
        got = flash_decode_attention(
            q.astype(jnp.bfloat16), hm(k.astype(jnp.bfloat16)),
            hm(v.astype(jnp.bfloat16)), lengths,
            alibi_slopes=sl, **INTERP)
        np.testing.assert_allclose(np.float32(got), np.float32(ref),
                                   rtol=3e-2, atol=3e-2)

    def test_softcap_and_scale(self):
        """gemma2 attention variations through the kernel (r5: static
        softcap + score-scale params) match attend()'s softcap path,
        including the tail attend."""
        B, S, D, H, R = 3, 128, 64, 4, 4
        ks = jax.random.split(jax.random.PRNGKey(11), 5)
        q = jax.random.normal(ks[0], (B, H, D), jnp.float32) * 3
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
        lengths = jnp.asarray([100, 40, 7], jnp.int32)
        cap, sc = 20.0, 24.0 ** -0.5
        ref = attend(q[:, None].astype(jnp.bfloat16),
                     k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                     (lengths - 1)[:, None], lengths,
                     scale=sc, softcap=cap)[:, 0]
        got = flash_decode_attention(
            q.astype(jnp.bfloat16), hm(k.astype(jnp.bfloat16)),
            hm(v.astype(jnp.bfloat16)), lengths,
            softcap=cap, scale=sc, **INTERP)
        np.testing.assert_allclose(np.float32(got), np.float32(ref),
                                   rtol=3e-2, atol=3e-2)

        # tail-staged variant: last tl tokens live in the token-major tail
        kt = jax.random.normal(ks[3], (R, B, H, D), jnp.float32)
        vt = jax.random.normal(ks[4], (R, B, H, D), jnp.float32)
        tl = jnp.asarray([2, 4, 1], jnp.int32)
        k_full = jnp.concatenate(
            [k, jnp.moveaxis(kt, 1, 0)], axis=1)   # [B, S+R, H, D]
        v_full = jnp.concatenate([v, jnp.moveaxis(vt, 1, 0)], axis=1)
        # reference: per-row contiguous [0, len) + tail staged right after
        k_ref = k_full.copy()
        v_ref = v_full.copy()
        for b in range(B):
            ln = int(lengths[b])
            k_ref = k_ref.at[b, ln:ln + int(tl[b])].set(
                jnp.moveaxis(kt, 1, 0)[b, :int(tl[b])])
            v_ref = v_ref.at[b, ln:ln + int(tl[b])].set(
                jnp.moveaxis(vt, 1, 0)[b, :int(tl[b])])
        ref_t = attend(q[:, None].astype(jnp.bfloat16),
                       k_ref.astype(jnp.bfloat16),
                       v_ref.astype(jnp.bfloat16),
                       (lengths + tl - 1)[:, None], lengths + tl,
                       scale=sc, softcap=cap)[:, 0]
        got_t = flash_decode_attention(
            q.astype(jnp.bfloat16), hm(k.astype(jnp.bfloat16)),
            hm(v.astype(jnp.bfloat16)), lengths,
            k_tail=kt.astype(jnp.bfloat16), v_tail=vt.astype(jnp.bfloat16),
            tail_lens=tl, softcap=cap, scale=sc, **INTERP)
        np.testing.assert_allclose(np.float32(got_t), np.float32(ref_t),
                                   rtol=3e-2, atol=3e-2)

    @pytest.mark.parametrize("with_alibi", [False, True])
    def test_tail_with_head_grid_split(self, with_alibi):
        """Tail-staged kernel with the head grid SPLIT (h_blk < n_kv):
        the tail refs must be sliced to the program's head range.
        Regression: an ALiBi-path variable shadowed the slicing lambda
        and crashed any split+tail trace."""
        from mixq_tpu.models.layers import alibi_slopes

        B, S, H, D, R = 2, 128, 2, 64, 4
        ks = jax.random.split(jax.random.PRNGKey(9), 5)
        q = jax.random.normal(ks[0], (B, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
        kt = jax.random.normal(ks[3], (R, B, H, D), jnp.bfloat16)
        vt = jax.random.normal(ks[4], (R, B, H, D), jnp.bfloat16)
        lengths = jnp.asarray([100, 64], jnp.int32)   # main tokens
        tail_lens = jnp.asarray([3, 1], jnp.int32)
        sl = alibi_slopes(H) if with_alibi else None
        # reference: attend over main with the tail written at its
        # positions
        k_full, v_full = k, v
        for b in range(B):
            for j in range(int(tail_lens[b])):
                k_full = k_full.at[b, int(lengths[b]) + j].set(kt[j, b])
                v_full = v_full.at[b, int(lengths[b]) + j].set(vt[j, b])
        tot = lengths + tail_lens
        ref = attend(q[:, None], k_full, v_full, (tot - 1)[:, None], tot,
                     alibi=sl)[:, 0]
        got = flash_decode_attention(
            q, hm(k), hm(v), lengths, k_tail=kt, v_tail=vt,
            tail_lens=tail_lens, alibi_slopes=sl, h_blk=1, **INTERP)
        np.testing.assert_allclose(np.float32(got), np.float32(ref),
                                   rtol=3e-2, atol=3e-2)

    def test_zero_length_rows_are_zero(self):
        B, S, H, D = 3, 128, 2, 64
        q = jnp.ones((B, H, D), jnp.bfloat16)
        k = jnp.ones((B, S, H, D), jnp.bfloat16)
        lengths = jnp.asarray([64, 0, 32], jnp.int32)
        got = flash_decode_attention(q, hm(k), hm(k), lengths,
                                     **INTERP)
        assert np.all(np.float32(got[1]) == 0.0)
        assert np.all(np.isfinite(np.float32(got)))


class TestBatchRowBlocking:
    """b_blk > 1 (small-S program-overhead amortization): the row-blocked
    kernel must be numerically identical in structure to b_blk=1 — per-row
    masks from unrolled SMEM reads, fused (head,row) batched dots, per-row
    tail stages. Parity vs attend() and vs the unblocked kernel."""

    @pytest.mark.parametrize("kv", ["bfloat16", "int8"])
    def test_parity_vs_unblocked(self, kv):
        B, S, H, D = 16, 32, 4, 128
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
        lengths = jnp.asarray([32, 17, 1, 32, 5, 32, 9, 32,
                               2, 32, 32, 11, 32, 3, 32, 0], jnp.int32)
        starts = jnp.asarray([0, 2, 0, 0, 1, 0, 0, 4,
                              0, 0, 3, 0, 0, 0, 7, 0], jnp.int32)
        if kv == "int8":
            qk8, sk = Q.quantize_kv(k)
            qv8, sv = Q.quantize_kv(v)
            args = dict(k_scale=hm(sk), v_scale=hm(sv))
            kk, vv = hm(qk8), hm(qv8)
        else:
            args = {}
            kk = hm(k.astype(jnp.bfloat16))
            vv = hm(v.astype(jnp.bfloat16))
        qq = q.astype(jnp.bfloat16)
        base = flash_decode_attention(qq, kk, vv, lengths, kv_start=starts,
                                      b_blk=1, **args, **INTERP)
        blk = flash_decode_attention(qq, kk, vv, lengths, kv_start=starts,
                                     b_blk=8, **args, **INTERP)
        np.testing.assert_allclose(np.float32(blk), np.float32(base),
                                   rtol=2e-2, atol=2e-2)
        assert np.all(np.float32(blk[-1]) == 0.0)   # zero-length row

    def test_tail_parity_vs_unblocked(self):
        B, S, H, D, R = 8, 32, 4, 128, 4
        ks = jax.random.split(jax.random.PRNGKey(12), 5)
        q = jax.random.normal(ks[0], (B, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
        kt = jax.random.normal(ks[3], (R, B, H, D), jnp.bfloat16)
        vt = jax.random.normal(ks[4], (R, B, H, D), jnp.bfloat16)
        lengths = jnp.asarray([20, 8, 0, 28, 15, 1, 28, 6], jnp.int32)
        tail_lens = jnp.asarray([3, 1, 2, 0, 4, 1, 2, 3], jnp.int32)
        base = flash_decode_attention(
            q, hm(k), hm(v), lengths, k_tail=kt, v_tail=vt,
            tail_lens=tail_lens, b_blk=1, **INTERP)
        blk = flash_decode_attention(
            q, hm(k), hm(v), lengths, k_tail=kt, v_tail=vt,
            tail_lens=tail_lens, b_blk=8, **INTERP)
        np.testing.assert_allclose(np.float32(blk), np.float32(base),
                                   rtol=2e-2, atol=2e-2)

    def test_int8_tail_vs_attend(self):
        """Row-blocked int8 kernel incl. quantized tail vs the attend()
        reference with the tail written at its positions."""
        B, S, H, D, R = 8, 32, 4, 128, 4
        ks = jax.random.split(jax.random.PRNGKey(13), 5)
        q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
        kt = jax.random.normal(ks[3], (R, B, H, D), jnp.float32)
        vt = jax.random.normal(ks[4], (R, B, H, D), jnp.float32)
        lengths = jnp.asarray([20, 8, 28, 28, 15, 1, 28, 6], jnp.int32)
        tail_lens = jnp.asarray([3, 1, 2, 0, 4, 1, 2, 3], jnp.int32)
        k_full, v_full = k, v
        for b in range(B):
            for j in range(int(tail_lens[b])):
                k_full = k_full.at[b, int(lengths[b]) + j].set(kt[j, b])
                v_full = v_full.at[b, int(lengths[b]) + j].set(vt[j, b])
        tot = lengths + tail_lens
        ref = attend(q[:, None], k_full, v_full, (tot - 1)[:, None],
                     tot)[:, 0]
        qk8, sk = Q.quantize_kv(k)
        qv8, sv = Q.quantize_kv(v)
        qkt8, skt = Q.quantize_kv(kt)          # [R, B, H(, D)]
        qvt8, svt = Q.quantize_kv(vt)
        got = flash_decode_attention(
            q, hm(qk8), hm(qv8), lengths, k_scale=hm(sk), v_scale=hm(sv),
            k_tail=qkt8, v_tail=qvt8,
            kt_scale=jnp.moveaxis(skt, 0, 1),   # [B, R, H]
            vt_scale=jnp.moveaxis(svt, 0, 1),
            tail_lens=tail_lens, b_blk=8, **INTERP)
        np.testing.assert_allclose(np.float32(got), np.float32(ref),
                                   rtol=4e-2, atol=4e-2)


def tiny():
    cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    return cfg, specs, params


def run_steps(params, cfg, specs, cache, tokens, n_steps, slot_mode=False):
    """Prefill + n decode steps with FIXED decode tokens (no argmax
    feedback — a near-tie flip would amplify benign numeric differences
    into full trajectory divergence); returns stacked last-token logits."""
    jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))
    logits, cache = jfwd(params, tokens, cache, specs=specs, cfg=cfg)
    outs = [logits[:, -1]]
    B, T = tokens.shape
    for i in range(n_steps):
        nxt = jnp.full((B,), 7 + 3 * i, jnp.int32)
        if slot_mode:
            sl = jnp.full((B,), T + i, jnp.int32)
            logits, cache = jfwd(params, nxt[:, None], cache, specs=specs,
                                 cfg=cfg, slot_lengths=sl)
            cache = cache.advance(1)
        else:
            logits, cache = jfwd(params, nxt[:, None], cache, specs=specs,
                                 cfg=cfg)
        outs.append(logits[:, -1])
    return np.asarray(jnp.stack(outs), np.float32)


class TestForwardFlash:
    @pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
    def test_flash_matches_xla(self, kv_dtype):
        import dataclasses

        cfg, specs, params = tiny()
        fspecs = dataclasses.replace(specs, attn_impl="flash")
        B, T, S = 2, 8, 32
        tokens = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        mk = lambda hm_: KVCache.create(
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.dtype(kv_dtype), head_major=hm_)
        ref = run_steps(params, cfg, specs, mk(False), tokens, 3)
        got = run_steps(params, cfg, fspecs, mk(True), tokens, 3)
        np.testing.assert_allclose(got, ref, rtol=6e-2, atol=6e-2)

    def test_flash_scan_slot_mode(self):
        """Stacked (scan) params + slot-mode decode writes on the
        head-major cache match the loop path."""
        import dataclasses

        cfg, specs, params = tiny()
        fspecs = dataclasses.replace(specs, attn_impl="flash")
        B, T, S = 2, 4, 16
        tokens = jnp.ones((B, T), jnp.int32)
        mk = lambda: KVCache.create(
            cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
            cfg.head_dim_, jnp.bfloat16, head_major=True)
        ref = run_steps(params, cfg, fspecs, mk(), tokens, 2, slot_mode=True)
        got = run_steps(stack_decoder_params(params), cfg, fspecs, mk(),
                        tokens, 2, slot_mode=True)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


class TestEngineFlash:
    def test_generate_matches_xla_engine(self):
        import dataclasses

        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine import InferenceEngine

        cfg, specs, params = tiny()
        ecfg = EngineConfig(max_seq_len=64, prefill_chunk=8, kv_dtype="int8")
        eng_x = InferenceEngine(params, cfg, specs, ecfg)
        eng_f = InferenceEngine(
            params, cfg, dataclasses.replace(specs, attn_impl="flash"), ecfg)
        prompts = [[1, 5, 9, 4], [2, 2, 7]]
        ref = eng_x.generate(prompts, max_new_tokens=6)
        got = eng_f.generate(prompts, max_new_tokens=6)
        assert got == ref


class TestHeadMajorSharding:
    def test_shard_head_major_cache(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from jax.sharding import PartitionSpec as P

        from mixq_tpu.parallel import make_mesh, shard_kv_cache

        cache = KVCache.create(2, 4, 16, 4, 32, jnp.int8, head_major=True)
        mesh = make_mesh((2, 4))
        sc = shard_kv_cache(cache, mesh)
        assert sc.k.sharding.spec == P(None, "model", "data", None, None)
        assert sc.k_scale.sharding.spec == P(None, "model", "data", None)


class TestAutoPolicy:
    """use_head_major_cache: the single serving-time policy point."""

    def test_policy(self):
        from mixq_tpu.ops.pallas.flash_decode import use_head_major_cache

        mc = ModelConfig.tiny(num_key_value_heads=4)
        # explicit opt-in runs interpret-mode on CPU backends
        assert use_head_major_cache("flash", mc, 64, 1)
        # auto never picks the interpret-mode kernel off-TPU
        assert not use_head_major_cache("auto", mc, 64, 1)
        assert not use_head_major_cache("xla", mc, 64, 1)
        # sliding-window models: explicit flash windows via the kernel's
        # start offset; auto stays on the memory-bounded ring cache
        import dataclasses as _dc
        win = _dc.replace(mc, sliding_window=32)
        assert use_head_major_cache("flash", win, 64, 1)
        assert not use_head_major_cache("auto", win, 64, 1)
        # ALiBi rides the kernel's baked-constant bias on explicit flash
        ali = _dc.replace(mc, alibi=True)
        assert use_head_major_cache("flash", ali, 64, 1)
        assert not use_head_major_cache("auto", ali, 64, 1)

    def test_default_is_auto(self):
        assert DecoderSpecs().attn_impl == "auto"
        assert DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8)).attn_impl \
            == "auto"
