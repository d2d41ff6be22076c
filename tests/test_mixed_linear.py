"""Tests for the mixed-precision linear (mixq_tpu/ops/mixed_linear.py).

Accuracy methodology mirrors the reference's implicit contract: the quantized
linear must track the fp linear closely on gaussian activations, and must
track it even in the presence of large per-channel outliers when the outlier
path is enabled (the whole point of MixQ)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import (
    LinearSpec, from_float, mixed_linear, mixed_linear_prepared, prepare_act,
    promote_outliers,
)


def make_data(key=0, M=16, K=128, N=64, outlier_channels=(), outlier_scale=30.0):
    kx, kw = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (M, K))
    w = jax.random.normal(kw, (K, N)) * 0.05
    for c in outlier_channels:
        x = x.at[:, c].multiply(outlier_scale)
    return x, w


def rel_err(y, ref):
    return float(jnp.linalg.norm(y.astype(jnp.float32) - ref) / jnp.linalg.norm(ref))


class TestW8A8:
    def test_matches_fp_no_outliers(self):
        x, w = make_data()
        spec = LinearSpec(w_bit=8, a_bit=8)
        p = from_float(w, spec)
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w) < 0.02

    def test_outlier_path_recovers_accuracy(self):
        """With large activation outliers, per-token int8 crushes the inlier
        signal; routing the outlier channels through the fp16 path must
        recover accuracy by a wide margin (the core MixQ claim)."""
        x, w = make_data(outlier_channels=(3, 77), outlier_scale=100.0)
        spec = LinearSpec(w_bit=8, a_bit=8)
        p_naive = from_float(w, spec)
        err_naive = rel_err(mixed_linear(p_naive, x, spec), x @ w)
        oset = Q.outlier_set_from_indices(jnp.array([3, 77]), k=128, budget=16)
        p = from_float(w, spec, outlier_set=oset)
        err_mix = rel_err(mixed_linear(p, x, spec), x @ w)
        assert err_mix < 0.02
        assert err_naive > 3 * err_mix

    def test_bias(self):
        x, w = make_data()
        b = jnp.arange(64, dtype=jnp.float32) * 0.1
        spec = LinearSpec(w_bit=8, a_bit=8)
        p = from_float(w, spec, bias=b)
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w + b[None, :]) < 0.02

    def test_silu_fusion(self):
        x, w = make_data()
        spec = LinearSpec(w_bit=8, a_bit=8, fuse="silu")
        p = from_float(w, spec)
        y = mixed_linear(p, x, spec)
        ref = jax.nn.silu(x @ w)
        assert rel_err(y, ref) < 0.03

    def test_prepared_act_shared(self):
        # quantize once, feed two linears (reference SharedQuantizedInput /
        # cache.q_xcache reuse between up_proj and gate_proj)
        x, w1 = make_data(key=1)
        _, w2 = make_data(key=2)
        spec = LinearSpec(w_bit=8, a_bit=8)
        p1, p2 = from_float(w1, spec), from_float(w2, spec)
        act = prepare_act(x, p1, spec)
        y1 = mixed_linear_prepared(p1, act, spec)
        y2 = mixed_linear_prepared(p2, act, spec)
        assert rel_err(y1, x @ w1) < 0.02
        assert rel_err(y2, x @ w2) < 0.02

    def test_jit_compiles(self):
        x, w = make_data()
        spec = LinearSpec(w_bit=8, a_bit=8)
        p = from_float(w, spec)
        f = jax.jit(lambda p, x: mixed_linear(p, x, spec))
        y = f(p, x)
        assert rel_err(y, x @ w) < 0.02


class TestW4A4:
    def test_w4_packed_matches_fp(self):
        x, w = make_data(M=8, K=64, N=32)
        spec = LinearSpec(w_bit=4, a_bit=4)
        oset = Q.empty_outlier_set(64, budget=8)
        p = from_float(w, spec, outlier_set=oset)
        # default at-rest storage is packed uint8 halves (measured W4 rule,
        # PROFILE_r03 §4/§9: +12% at weight-bandwidth-bound batch)
        assert p.q_weight.dtype == jnp.uint8 and p.q_weight.shape == (32, 32)
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w) < 0.2  # int4 is coarse
        # explicit native int4 storage still supported (pack=True)
        p_native = from_float(w, spec, outlier_set=oset, pack=True)
        assert p_native.q_weight.dtype == jnp.int4
        y2 = mixed_linear(p_native, x, spec)
        assert rel_err(y2, y) < 1e-6  # same math, different storage

    def test_w4_outliers_help(self):
        x, w = make_data(M=8, K=64, N=32, outlier_channels=(5,))
        spec = LinearSpec(w_bit=4, a_bit=4)
        p_no = from_float(w, spec)
        err_no = rel_err(mixed_linear(p_no, x, spec), x @ w)
        oset = Q.outlier_set_from_indices(jnp.array([5]), k=64, budget=8)
        p_o = from_float(w, spec, outlier_set=oset)
        err_o = rel_err(mixed_linear(p_o, x, spec), x @ w)
        assert err_o < err_no * 0.5


class TestW8A16:
    def test_weight_only(self):
        x, w = make_data()
        spec = LinearSpec(w_bit=8, a_bit=16, version="WEIGHT_ONLY")
        p = from_float(w, spec)
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w) < 0.02


class TestQUIK:
    def test_quik_int4(self):
        x, w = make_data(M=8, K=64, N=32, outlier_channels=(5, 11))
        spec = LinearSpec(w_bit=4, a_bit=4, version="QUIK")
        oset = Q.outlier_set_from_indices(jnp.array([5, 11]), k=64, budget=8)
        p = from_float(w, spec, outlier_set=oset)
        assert p.reduced_w is not None
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w) < 0.15

    def test_quik_int8(self):
        x, w = make_data(outlier_channels=(3,))
        spec = LinearSpec(w_bit=8, a_bit=8, version="QUIK")
        oset = Q.outlier_set_from_indices(jnp.array([3]), k=128, budget=16)
        p = from_float(w, spec, outlier_set=oset)
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w) < 0.02


class TestFP16:
    def test_passthrough(self):
        x, w = make_data()
        spec = LinearSpec(version="FP16", w_bit=16, out_dtype="float32")
        p = from_float(w, spec, store_dtype=jnp.float32)
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w) < 1e-5


class TestOnlinePromotion:
    def test_promote_then_accurate(self):
        """Reference warmup lifecycle (linear.py:200-227): start with no
        outliers, detect on a live activation, promote weight rows, verify the
        promoted linear matches fp."""
        x, w = make_data(outlier_channels=(9, 42), outlier_scale=20.0)
        spec = LinearSpec(w_bit=8, a_bit=8)
        oset0 = Q.empty_outlier_set(128, budget=16)
        p = from_float(w, spec, outlier_set=oset0)
        err_before = rel_err(mixed_linear(p, x, spec), x @ w)
        oset1 = Q.detect_new_outliers(x, oset0, sigma=6.0)
        assert int(oset1.count) == 2
        p2 = promote_outliers(p, w, oset1, spec)
        err_after = rel_err(mixed_linear(p2, x, spec), x @ w)
        assert err_after < 0.02
        assert err_after < err_before
