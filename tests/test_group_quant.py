"""Group-wise weight quantization (q_group_size parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.models import KVCache
from mixq_tpu.models.decoder import forward
from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import LinearSpec, from_float, mixed_linear
from mixq_tpu.quantize import quantize_model, resolve_specs
from test_quantize_pipeline import FakeSource, make_hf_style_state

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


def rel_err(y, ref):
    return float(jnp.linalg.norm(y.astype(jnp.float32) - ref)
                 / jnp.linalg.norm(ref))


class TestGroupQuantOps:
    def test_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (128, 32))
        q, s = Q.quantize_weight_grouped(w, bits=4, group_size=32)
        assert s.shape == (4, 32)
        w_hat = (q.astype(jnp.float32).reshape(4, 32, 32)
                 * s[:, None, :]).reshape(128, 32)
        assert rel_err(w_hat, w) < 0.1

    def test_grouped_matmul_matches_dense_dequant(self):
        kx = jax.random.PRNGKey(1)
        x = jax.random.normal(kx, (8, 128))
        w = jax.random.normal(jax.random.PRNGKey(2), (128, 32)) * 0.05
        qx, xs = Q.quantize_act_per_token(x)
        qw, ws = Q.quantize_weight_grouped(w, bits=8, group_size=32)
        y = Q.grouped_int8_matmul_dequant(qx, xs, qw, ws)
        assert rel_err(y, x @ w) < 0.02

    def test_group_beats_per_channel_at_4bit(self):
        """Per-group scales must reduce 4-bit error on weights with
        K-varying magnitude (the reason group quant exists)."""
        key = jax.random.PRNGKey(3)
        w = jax.random.normal(key, (128, 32)) * 0.05
        # magnitude ramp along K: per-channel absmax dominated by the tail
        w = w * jnp.linspace(0.1, 4.0, 128)[:, None]
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 128))

        spec_pc = LinearSpec(w_bit=4, a_bit=8)
        spec_g = LinearSpec(w_bit=4, a_bit=8, group_size=32)
        err_pc = rel_err(mixed_linear(from_float(w, spec_pc), x, spec_pc),
                         x @ w)
        err_g = rel_err(mixed_linear(from_float(w, spec_g), x, spec_g), x @ w)
        assert err_g < err_pc

    def test_group_with_outliers(self):
        w = jax.random.normal(jax.random.PRNGKey(5), (64, 32)) * 0.05
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 64))
        x = x.at[:, 7].multiply(50.0)
        oset = Q.outlier_set_from_indices(jnp.array([7]), k=64, budget=8)
        spec = LinearSpec(w_bit=8, a_bit=8, group_size=16)
        p = from_float(w, spec, outlier_set=oset)
        assert p.w_scale.shape == (4, 32)
        y = mixed_linear(p, x, spec)
        assert rel_err(y, x @ w) < 0.02


class TestGroupQuantModel:
    def test_end_to_end(self):
        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig(w_bit=8, a_bit=8, version="MIX",
                           q_group_size=16, outlier_budget=8)
        qparams, specs = quantize_model(src, cfg, qcfg)
        assert specs.wqkv.group_size == 16
        assert qparams.blocks[0].attn.wq.w_scale.ndim == 2
        tokens = jnp.ones((1, 6), jnp.int32)
        cache = KVCache.create(cfg.num_hidden_layers, 1, 8,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        lg, _ = _jfwd(qparams, tokens, cache, specs=specs, cfg=cfg)
        assert not np.any(np.isnan(np.asarray(lg)))
