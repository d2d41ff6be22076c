"""Pallas fused decode attention vs the jnp attend() reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.models.layers import KVCache, attend
from mixq_tpu.ops.pallas.decode_attention import decode_attention


def setup(B=2, S=32, n_q=4, n_kv=2, D=128, kv_dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, 1, n_q, D)).astype(jnp.bfloat16)
    k_raw = jax.random.normal(ks[1], (B, S, n_kv, D)) * 2.0
    v_raw = jax.random.normal(ks[2], (B, S, n_kv, D))
    cache = KVCache.create(1, B, S, n_kv, D, kv_dtype)
    # fill the cache through its own quantization path
    c = cache.update_layer(0, k_raw, v_raw)
    k, v, ks_, vs_ = c.layer_kv(0)
    return q, k, v, ks_, vs_


def run_ref(q, k, v, ks_, vs_, kv_len):
    B = q.shape[0]
    q_slot = jnp.asarray([kv_len - 1], jnp.int32)
    return attend(q, k, v, q_slot, jnp.asarray(kv_len),
                  k_scale=ks_, v_scale=vs_)


class TestDecodeAttention:
    @pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8])
    def test_matches_reference(self, kv_dtype):
        q, k, v, ks_, vs_ = setup(kv_dtype=kv_dtype)
        kv_len = 20
        ref = run_ref(q, k, v, ks_, vs_, kv_len)       # [B, 1, n_q, D]
        got = decode_attention(q[:, 0], k, v, kv_len, ks_, vs_,
                               interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref[:, 0], np.float32),
            rtol=2e-2, atol=2e-2)

    def test_mha(self):
        q, k, v, ks_, vs_ = setup(n_q=4, n_kv=4, kv_dtype=jnp.int8)
        ref = run_ref(q, k, v, ks_, vs_, 32)
        got = decode_attention(q[:, 0], k, v, 32, ks_, vs_, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref[:, 0], np.float32),
            rtol=2e-2, atol=2e-2)

    def test_per_row_lengths(self):
        q, k, v, ks_, vs_ = setup(B=3, kv_dtype=jnp.int8, seed=1)
        lens = jnp.asarray([5, 20, 32], jnp.int32)
        got = decode_attention(q[:, 0], k, v, lens, ks_, vs_, interpret=True)
        for b in range(3):
            ref_b = run_ref(q[b:b+1], k[b:b+1], v[b:b+1],
                            None if ks_ is None else ks_[b:b+1],
                            None if vs_ is None else vs_[b:b+1],
                            int(lens[b]))
            np.testing.assert_allclose(
                np.asarray(got[b], np.float32),
                np.asarray(ref_b[0, 0], np.float32), rtol=2e-2, atol=2e-2)

    def test_masking_excludes_garbage(self):
        """Slots beyond kv_len must not affect the output."""
        q, k, v, ks_, vs_ = setup(kv_dtype=jnp.bfloat16, seed=2)
        kv_len = 10
        got1 = decode_attention(q[:, 0], k, v, kv_len, interpret=True)
        # poison the tail
        k2 = k.at[:, kv_len:].set(99.0)
        v2 = v.at[:, kv_len:].set(-99.0)
        got2 = decode_attention(q[:, 0], k2, v2, kv_len, interpret=True)
        np.testing.assert_allclose(np.asarray(got1, np.float32),
                                   np.asarray(got2, np.float32),
                                   rtol=1e-5, atol=1e-5)
