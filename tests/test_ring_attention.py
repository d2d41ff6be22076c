"""Ring (sequence-parallel) attention vs dense causal attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mixq_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def dense_causal(q, k, v):
    B, T, H, D = q.shape
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (D ** 0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))
    s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))


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
