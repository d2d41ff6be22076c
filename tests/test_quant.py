"""Unit tests for the quantization core (mixq_tpu/ops/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.ops import quant as Q


def rand(key, *shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * scale


class TestWeightQuant:
    def test_int8_roundtrip(self):
        w = rand(0, 64, 32)
        q, s = Q.quantize_weight_int8(w)
        assert q.dtype == jnp.int8
        w_hat = q.astype(jnp.float32) * s[None, :]
        err = jnp.max(jnp.abs(w - w_hat))
        # max error is half an lsb per channel
        assert err <= jnp.max(s) * 0.5 + 1e-6

    def test_int8_range(self):
        w = rand(1, 128, 16, scale=10.0)
        q, _ = Q.quantize_weight_int8(w)
        assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127

    def test_int4_roundtrip(self):
        w = rand(2, 64, 32)
        q, s = Q.quantize_weight_int4(w)
        assert int(jnp.max(q.astype(jnp.int32))) <= 7
        assert int(jnp.min(q.astype(jnp.int32))) >= -8
        w_hat = q.astype(jnp.float32) * s[None, :]
        assert jnp.max(jnp.abs(w - w_hat)) <= jnp.max(s) * 0.5 + 1e-6

    def test_zero_weight_column(self):
        w = jnp.zeros((16, 8))
        q, s = Q.quantize_weight_int8(w)
        assert not np.any(np.isnan(np.asarray(s)))
        assert np.all(np.asarray(q) == 0)


class TestInt4Pack:
    def test_pack_unpack_identity(self):
        q = jax.random.randint(jax.random.PRNGKey(3), (64, 32), -8, 8, jnp.int8)
        packed = Q.pack_int4(q)
        assert packed.shape == (32, 32) and packed.dtype == jnp.uint8
        assert np.array_equal(np.asarray(Q.unpack_int4(packed)), np.asarray(q))

    def test_pack_extremes(self):
        q = jnp.array([[-8, 7], [7, -8]], jnp.int8)
        assert np.array_equal(np.asarray(Q.unpack_int4(Q.pack_int4(q))), np.asarray(q))


class TestActQuant:
    def test_per_token_roundtrip(self):
        x = rand(4, 8, 64, scale=3.0)
        q, s = Q.quantize_act_per_token(x)
        x_hat = q.astype(jnp.float32) * s
        assert jnp.max(jnp.abs(x - x_hat)) <= jnp.max(s) * 0.5 + 1e-6

    def test_scale_shape(self):
        x = rand(5, 2, 8, 64)
        q, s = Q.quantize_act_per_token(x)
        assert s.shape == (2, 8, 1)

    def test_asymmetric_roundtrip(self):
        x = rand(6, 8, 64) + 2.0  # shifted distribution: where asym wins
        q, s, z = Q.quantize_act_asymmetric(x, bits=4)
        x_hat = (q.astype(jnp.float32) + z) * s
        assert jnp.max(jnp.abs(x - x_hat)) <= jnp.max(s) * 0.51 + 1e-5

    def test_asymmetric_range(self):
        x = rand(7, 4, 32, scale=5.0)
        q, _, _ = Q.quantize_act_asymmetric(x, bits=4)
        qi = q.astype(jnp.int32)
        assert int(jnp.max(qi)) <= 7 and int(jnp.min(qi)) >= -8


class TestOutlierSet:
    def test_from_indices(self):
        oset = Q.outlier_set_from_indices(jnp.array([3, 7, 11]), k=16, budget=8)
        assert int(oset.count) == 3
        np.testing.assert_array_equal(np.asarray(oset.ind[:3]), [3, 7, 11])
        km = np.asarray(oset.k_mask)
        assert km[3] == 0 and km[7] == 0 and km[11] == 0 and km.sum() == 13

    def test_extract_and_mask(self):
        x = jnp.arange(16, dtype=jnp.float32)[None, :]
        oset = Q.outlier_set_from_indices(jnp.array([2, 5]), k=16, budget=4)
        out = Q.extract_outliers(x, oset)
        np.testing.assert_array_equal(np.asarray(out[0, :2]), [2.0, 5.0])
        np.testing.assert_array_equal(np.asarray(out[0, 2:]), [0.0, 0.0])
        xin = Q.mask_inliers(x, oset)
        assert xin[0, 2] == 0 and xin[0, 5] == 0 and xin[0, 3] == 3

    def test_detect_new_outliers(self):
        x = jnp.ones((4, 16)) * 0.1
        x = x.at[:, 5].set(10.0).at[:, 9].set(8.0)
        oset = Q.empty_outlier_set(16, budget=4)
        new = Q.detect_new_outliers(x, oset, sigma=6.0)
        assert int(new.count) == 2
        got = set(np.asarray(new.ind[:2]).tolist())
        assert got == {5, 9}
        assert new.k_mask[5] == 0 and new.k_mask[9] == 0

    def test_detect_respects_budget(self):
        x = jnp.ones((2, 16)) * 20.0  # every channel an outlier
        oset = Q.empty_outlier_set(16, budget=4)
        new = Q.detect_new_outliers(x, oset, sigma=6.0)
        assert int(new.count) == 4
        assert float(jnp.sum(1.0 - new.k_mask)) == 4.0

    def test_detect_sticky(self):
        # already-known outliers are not re-added (reference sticky ind set)
        oset = Q.outlier_set_from_indices(jnp.array([5]), k=16, budget=4)
        x = jnp.zeros((2, 16)).at[:, 5].set(30.0)
        new = Q.detect_new_outliers(x, oset, sigma=6.0)
        assert int(new.count) == 1

    def test_detect_no_outliers(self):
        oset = Q.empty_outlier_set(16, budget=4)
        new = Q.detect_new_outliers(jnp.ones((2, 16)), oset, sigma=6.0)
        assert int(new.count) == 0
        assert float(jnp.sum(new.k_mask)) == 16.0

    def test_top_k_from_scales(self):
        scales = jnp.arange(16.0)
        oset = Q.top_k_outliers_from_scales(scales, n=3, k=16, budget=8)
        got = set(np.asarray(oset.ind[:3]).tolist())
        assert got == {15, 14, 13}

    def test_gather_outlier_weights(self):
        w = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
        oset = Q.outlier_set_from_indices(jnp.array([1, 6]), k=8, budget=4)
        rows = Q.gather_outlier_weights(w, oset)
        np.testing.assert_array_equal(np.asarray(rows[0]), np.asarray(w[1]))
        np.testing.assert_array_equal(np.asarray(rows[1]), np.asarray(w[6]))
        assert float(jnp.sum(jnp.abs(rows[2:]))) == 0.0


class TestEpilogue:
    def test_dequant_matches_fp(self):
        x = rand(8, 4, 32)
        w = rand(9, 32, 16)
        qx, sx = Q.quantize_act_per_token(x)
        qw, sw = Q.quantize_weight_int8(w)
        acc = jax.lax.dot_general(
            qx, qw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = Q.dequant_epilogue(acc, sx, sw, out_dtype=jnp.float32)
        ref = x @ w
        rel = jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref)
        assert float(rel) < 0.02

    def test_reduced_weight_rowsum(self):
        qw = jnp.array([[1, -2], [3, 4]], jnp.int8)
        np.testing.assert_array_equal(np.asarray(Q.reduced_weight_rowsum(qw)), [4.0, 2.0])
