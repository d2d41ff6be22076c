"""Pallas kernels vs jnp reference (interpret mode on CPU — SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.pallas.int8_matmul import int8_matmul_dequant
from mixq_tpu.ops.pallas.rmsnorm_quant import fused_rmsnorm_quant
from mixq_tpu.ops.pallas.w8a16 import w8a16_matmul


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)


def make_quant_inputs(M=64, K=128, N=96, key=0):
    kx, kw = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (M, K))
    w = jax.random.normal(kw, (K, N)) * 0.05
    qx, xs = Q.quantize_act_per_token(x)
    qw, ws = Q.quantize_weight_int8(w)
    return x, w, qx, xs, qw, ws


class TestInt8MatmulDequant:
    def test_matches_reference(self):
        x, w, qx, xs, qw, ws = make_quant_inputs()
        ref = Q.dequant_epilogue(
            jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            xs, ws, out_dtype=jnp.float32)
        got = int8_matmul_dequant(qx, qw, xs, ws, out_dtype=jnp.float32,
                                  interpret=True)
        assert rel_err(got, ref) < 2e-3

    def test_silu_fusion(self):
        x, w, qx, xs, qw, ws = make_quant_inputs(key=1)
        base = Q.dequant_epilogue(
            jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            xs, ws, out_dtype=jnp.float32)
        ref = jax.nn.silu(base)
        got = int8_matmul_dequant(qx, qw, xs, ws, fuse="silu",
                                  out_dtype=jnp.float32, interpret=True)
        assert rel_err(got, ref) < 2e-3

    def test_outlier_accumulate(self):
        x, w, qx, xs, qw, ws = make_quant_inputs(key=2)
        Bo = 16
        xo = jax.random.normal(jax.random.PRNGKey(3), (64, Bo)).astype(jnp.bfloat16)
        wo = (jax.random.normal(jax.random.PRNGKey(4), (Bo, 96)) * 0.05
              ).astype(jnp.bfloat16)
        base = Q.dequant_epilogue(
            jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            xs, ws, out_dtype=jnp.float32)
        ref = base + xo.astype(jnp.float32) @ wo.astype(jnp.float32)
        got = int8_matmul_dequant(qx, qw, xs, ws, xo, wo,
                                  out_dtype=jnp.float32, interpret=True)
        assert rel_err(got, ref) < 2e-3

    def test_unaligned_shapes(self):
        x, w, qx, xs, qw, ws = make_quant_inputs(M=33, K=128, N=70, key=5)
        ref = Q.dequant_epilogue(
            jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            xs, ws, out_dtype=jnp.float32)
        got = int8_matmul_dequant(qx, qw, xs, ws, out_dtype=jnp.float32,
                                  interpret=True)
        assert got.shape == (33, 70)
        assert rel_err(got, ref) < 2e-3


class TestW8A16:
    def test_matches_reference(self):
        key = jax.random.PRNGKey(6)
        x = jax.random.normal(key, (48, 128)).astype(jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(7), (128, 96)) * 0.05
        qw, ws = Q.quantize_weight_int8(w)
        ref = x.astype(jnp.float32) @ (
            qw.astype(jnp.float32) * ws[None, :])
        got = w8a16_matmul(x, qw, ws, out_dtype=jnp.float32, interpret=True)
        assert rel_err(got, ref) < 5e-3


class TestFusedRMSNormQuant:
    def test_matches_reference(self):
        from mixq_tpu.models.layers import rmsnorm
        x = jax.random.normal(jax.random.PRNGKey(8), (32, 128)).astype(jnp.bfloat16)
        g = jnp.abs(jax.random.normal(jax.random.PRNGKey(9), (128,))) + 0.5
        y_ref = rmsnorm(x, g, 1e-5)
        q_ref, s_ref = Q.quantize_act_per_token(y_ref.astype(jnp.float32))
        y, qx, xs = fused_rmsnorm_quant(x, g, interpret=True)
        assert rel_err(y, y_ref) < 1e-2
        assert rel_err(np.asarray(qx, np.float32) * np.asarray(xs),
                       np.asarray(q_ref, np.float32) * np.asarray(s_ref)) < 2e-2

    def test_outlier_mask(self):
        x = jax.random.normal(jax.random.PRNGKey(10), (16, 64)).astype(jnp.bfloat16)
        g = jnp.ones((64,))
        k_mask = jnp.ones((64,)).at[5].set(0.0)
        y, qx, xs = fused_rmsnorm_quant(x, g, k_mask, interpret=True)
        assert np.all(np.asarray(qx)[:, 5] == 0)
        assert not np.all(np.asarray(qx)[:, 6] == 0)
