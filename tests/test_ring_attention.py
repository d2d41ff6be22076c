"""Ring (sequence-parallel) attention vs dense causal attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mixq_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def dense_causal(q, k, v, kv_start=None):
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    g = Hq // Hkv
    qf = q.reshape(B, T, Hkv, g, D)
    s = jnp.einsum("bthgd,bshd->bhgts", qf.astype(jnp.float32),
                   k.astype(jnp.float32)) / (D ** 0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))[None]
    if kv_start is not None:
        mask = mask & (jnp.arange(T)[None, None, :] >= kv_start[:, None, None])
    s = jnp.where(mask[:, None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgts,bshd->bthgd", p, v.astype(jnp.float32))
    return o.reshape(B, T, Hq, D)


def make_mesh_sp(sp):
    devs = np.asarray(jax.devices()[:sp]).reshape(sp)
    return Mesh(devs, ("sp",))


class TestRingAttention:
    @pytest.mark.parametrize("sp", [2, 4])
    def test_matches_dense(self, sp):
        B, T, H, D = 2, 8 * sp, 4, 16
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, T, H, D))
        k = jax.random.normal(ks[1], (B, T, H, D))
        v = jax.random.normal(ks[2], (B, T, H, D))
        ref = dense_causal(q, k, v)
        got = ring_attention(q, k, v, make_mesh_sp(sp))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-3, atol=2e-3)

    def test_jit_compiles(self):
        sp = 4
        B, T, H, D = 1, 4 * sp, 2, 8
        q = jnp.ones((B, T, H, D))
        mesh = make_mesh_sp(sp)
        f = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))
        out = f(q, q, q)
        assert out.shape == (B, T, H, D)
        assert not np.any(np.isnan(np.asarray(out)))

    @pytest.mark.parametrize("sp", [2, 4])
    def test_gqa_matches_dense(self, sp):
        """Every GQA model in the registry can ring now (4 q heads / 2 kv)."""
        B, T, Hq, Hkv, D = 2, 8 * sp, 4, 2, 16
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (B, T, Hq, D))
        k = jax.random.normal(ks[1], (B, T, Hkv, D))
        v = jax.random.normal(ks[2], (B, T, Hkv, D))
        ref = dense_causal(q, k, v)
        got = ring_attention(q, k, v, make_mesh_sp(sp))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-3, atol=2e-3)

    def test_kv_start_masks_left_padding(self):
        B, T, H, D = 2, 16, 2, 8
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (B, T, H, D))
        k = jax.random.normal(ks[1], (B, T, H, D))
        v = jax.random.normal(ks[2], (B, T, H, D))
        kv_start = jnp.asarray([3, 0], jnp.int32)
        ref = dense_causal(q, k, v, kv_start)
        got = ring_attention(q, k, v, make_mesh_sp(2), kv_start=kv_start)
        # compare only the real (non-pad) positions
        for b, st in enumerate([3, 0]):
            np.testing.assert_allclose(
                np.asarray(got, np.float32)[b, st:],
                np.asarray(ref, np.float32)[b, st:],
                rtol=2e-3, atol=2e-3)

    def test_tp_sp_two_axis_mesh(self):
        """TP x SP: sequence ring over 'sp' while heads shard over 'model'."""
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("sp", "model"))
        B, T, Hq, Hkv, D = 2, 8, 8, 4, 16
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (B, T, Hq, D))
        k = jax.random.normal(ks[1], (B, T, Hkv, D))
        v = jax.random.normal(ks[2], (B, T, Hkv, D))
        ref = dense_causal(q, k, v)
        got = jax.jit(lambda a, b, c: ring_attention(
            a, b, c, mesh, seq_axis="sp", head_axis="model"))(q, k, v)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-3, atol=2e-3)


class TestEngineRingPrefill:
    def test_engine_ring_prefill_matches_dense(self):
        """The engine routes long fresh-cache prefills through ring
        attention (context parallelism over 'data') and produces the same
        tokens as the dense prefill path."""
        from mixq_tpu.config import EngineConfig, ModelConfig
        from mixq_tpu.engine import InferenceEngine
        from mixq_tpu.models import DecoderSpecs
        from mixq_tpu.models.decoder import init_decoder_params
        from mixq_tpu.ops.mixed_linear import LinearSpec
        from mixq_tpu.parallel import make_mesh

        cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
        mesh = make_mesh((2, 4))

        ecfg = dict(max_seq_len=64, prefill_chunk=16)
        eng_ring = InferenceEngine(
            params, cfg, specs,
            EngineConfig(**ecfg, ring_prefill_axis="data",
                         ring_prefill_min_t=16),
            mesh=mesh)
        assert eng_ring._prefill_ring is not None
        assert eng_ring._use_ring(16)
        eng_dense = InferenceEngine(
            params, cfg, specs, EngineConfig(**ecfg), mesh=mesh)

        prompts = [list(range(1, 14)), list(range(5, 21))]  # padded to T=16
        got = eng_ring.generate(prompts, max_new_tokens=8)
        ref = eng_dense.generate(prompts, max_new_tokens=8)
        assert got == ref
