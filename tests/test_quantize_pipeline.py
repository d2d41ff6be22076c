"""End-to-end tests of the offline quantization pipeline:
calibrate -> pick outliers -> quantize -> save -> load -> run."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec
from mixq_tpu.quantize import (
    collect_act_scales, empty_outlier_sets, load_checkpoint,
    outlier_sets_from_scales, quantize_model, resolve_specs, save_checkpoint,
)

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


class FakeSource:
    """TensorSource over a dict (conversion path without HF)."""

    def __init__(self, d):
        self.d = d

    def get(self, k):
        return self.d[k]

    def has(self, k):
        return k in self.d


def make_hf_style_state(cfg: ModelConfig, seed=0):
    """Random llama-style state dict in HF naming."""
    rng = np.random.RandomState(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nq, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim_)
    d = {"model.embed_tokens.weight": rng.randn(V, H).astype(np.float32) * 0.02,
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": rng.randn(V, H).astype(np.float32) * 0.02}
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        d[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        d[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        d[p + "self_attn.q_proj.weight"] = rng.randn(nq * hd, H).astype(np.float32) * 0.05
        d[p + "self_attn.k_proj.weight"] = rng.randn(nkv * hd, H).astype(np.float32) * 0.05
        d[p + "self_attn.v_proj.weight"] = rng.randn(nkv * hd, H).astype(np.float32) * 0.05
        d[p + "self_attn.o_proj.weight"] = rng.randn(H, nq * hd).astype(np.float32) * 0.05
        d[p + "mlp.gate_proj.weight"] = rng.randn(I, H).astype(np.float32) * 0.05
        d[p + "mlp.up_proj.weight"] = rng.randn(I, H).astype(np.float32) * 0.05
        d[p + "mlp.down_proj.weight"] = rng.randn(H, I).astype(np.float32) * 0.05
    return d


class TestPolicy:
    def test_resolve_w8(self):
        specs = resolve_specs(QuantConfig.w8a8())
        assert specs.wqkv.w_bit == 8 and specs.wqkv.version == "MIX"
        assert specs.gate.fuse == "silu"

    def test_resolve_w4_eightbit_only(self):
        specs = resolve_specs(QuantConfig.w4a4())
        assert specs.wqkv.w_bit == 4
        assert specs.up.w_bit == 4
        # down_proj/o_proj forced to 8-bit (reference utils/module.py:2)
        assert specs.down.w_bit == 8
        assert specs.wo.w_bit == 8

    def test_resolve_weight_only(self):
        qcfg = QuantConfig.w8a8(weight_only_names=("down_proj",))
        specs = resolve_specs(qcfg)
        assert specs.down.version == "WEIGHT_ONLY"
        assert specs.wqkv.version == "MIX"

    def test_resolve_fp16(self):
        specs = resolve_specs(QuantConfig.fp16())
        assert specs.wqkv.version == "FP16"


class TestCalibration:
    def test_collect_scales_shapes(self):
        cfg = ModelConfig.tiny()
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        batches = [np.random.randint(0, cfg.vocab_size, (2, 16))
                   for _ in range(2)]
        scales = collect_act_scales(params, cfg, batches)
        assert f"0.wqkv" in scales and f"1.down" in scales
        assert scales["0.wqkv"].shape == (cfg.hidden_size,)
        assert scales["0.down"].shape == (cfg.intermediate_size,)
        assert all(np.all(v >= 0) for v in scales.values())

    def test_outlier_sets_from_scales(self):
        qcfg = QuantConfig.w4a4(outlier_budget=8)
        scales = {"0.wqkv": np.arange(64, dtype=np.float32)}
        osets = outlier_sets_from_scales(scales, qcfg)
        s = osets["0.wqkv"]
        assert int(s.count) == 8
        assert set(np.asarray(s.ind).tolist()) == set(range(56, 64))


class TestQuantizeModel:
    def _fp_logits(self, cfg, src, tokens):
        from mixq_tpu.models.hf import params_from_source
        specs = DecoderSpecs.fp16()
        params = params_from_source(src, cfg, specs)
        cache = KVCache.create(cfg.num_hidden_layers, tokens.shape[0], 32,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        lg, _ = _jfwd(params, jnp.asarray(tokens), cache, specs=specs, cfg=cfg)
        return np.asarray(lg)

    def test_w8_quantize_runs_close(self):
        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        tokens = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 8))
        ref = self._fp_logits(cfg, src, tokens)

        qcfg = QuantConfig.w8a8(outlier_budget=16)
        qparams, specs = quantize_model(src, cfg, qcfg)
        # online-ready: every linear carries a budget-reserved outlier set
        assert qparams.blocks[0].attn.wq.out_ind is not None
        cache = KVCache.create(cfg.num_hidden_layers, 2, 32,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        lg, _ = _jfwd(qparams, jnp.asarray(tokens), cache, specs=specs, cfg=cfg)
        p_ref = jax.nn.softmax(jnp.asarray(ref[:, -1]), -1)
        p_q = jax.nn.softmax(lg[:, -1], -1)
        tv = 0.5 * float(jnp.max(jnp.sum(jnp.abs(p_ref - p_q), -1)))
        assert tv < 0.1

    def test_w4_quantize_with_calibration(self):
        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w4a4(outlier_budget=16)
        batches = [np.random.randint(0, cfg.vocab_size, (2, 16))]
        qparams, specs = quantize_model(src, cfg, qcfg, calib_batches=batches)
        assert specs.wqkv.w_bit == 4
        assert int(qparams.blocks[0].attn.wq.out_count) == 16
        tokens = np.random.randint(0, cfg.vocab_size, (1, 8))
        cache = KVCache.create(cfg.num_hidden_layers, 1, 32,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        lg, _ = _jfwd(qparams, jnp.asarray(tokens), cache, specs=specs, cfg=cfg)
        assert not np.any(np.isnan(np.asarray(lg)))


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w8a8(outlier_budget=8)
        qparams, specs = quantize_model(src, cfg, qcfg)
        save_checkpoint(str(tmp_path), qparams, cfg, qcfg)

        loaded, cfg2, qcfg2 = load_checkpoint(str(tmp_path))
        assert cfg2 == cfg and qcfg2 == qcfg

        leaves1 = jax.tree_util.tree_leaves(qparams)
        leaves2 = jax.tree_util.tree_leaves(loaded)
        assert len(leaves1) == len(leaves2)
        for a, b in zip(leaves1, leaves2):
            assert a.dtype == b.dtype and a.shape == b.shape
            np.testing.assert_array_equal(
                np.asarray(a).astype(np.float32),
                np.asarray(b).astype(np.float32))

    def test_loaded_model_same_logits(self, tmp_path):
        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w8a8(outlier_budget=8)
        qparams, specs = quantize_model(src, cfg, qcfg)
        save_checkpoint(str(tmp_path), qparams, cfg, qcfg)
        loaded, cfg2, qcfg2 = load_checkpoint(str(tmp_path))
        specs2 = resolve_specs(qcfg2)

        tokens = jnp.ones((1, 4), jnp.int32)
        def run(p, s):
            cache = KVCache.create(cfg.num_hidden_layers, 1, 16,
                                   cfg.num_key_value_heads, cfg.head_dim_,
                                   jnp.bfloat16)
            return _jfwd(p, tokens, cache, specs=s, cfg=cfg)[0]
        np.testing.assert_array_equal(
            np.asarray(run(qparams, specs)), np.asarray(run(loaded, specs2)))


class TestShardedLoading:
    def test_load_with_shardings(self, tmp_path):
        """Regex-keyed shardings place leaves onto devices at read time
        (the multi-host loading story)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mixq_tpu.parallel import make_mesh

        if jax.device_count() < 8:
            import pytest
            pytest.skip("needs 8 virtual devices")
        cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w8a8(outlier_budget=8)
        qparams, specs = quantize_model(src, cfg, qcfg)
        save_checkpoint(str(tmp_path), qparams, cfg, qcfg)

        mesh = make_mesh((1, 8))
        shardings = {
            r"attn\.w[qkv]\.q_weight$": NamedSharding(mesh, P(None, "model")),
            r"mlp\.(up|gate)\.q_weight$": NamedSharding(mesh, P(None, "model")),
        }
        loaded, cfg2, _ = load_checkpoint(str(tmp_path), shardings=shardings)
        wq = loaded.blocks[0].attn.wq.q_weight
        assert wq.sharding.spec == P(None, "model")
        # unmatched leaves load unsharded (single-device sharding)
        assert not hasattr(loaded.embed.sharding, "spec")


class TestInt4Checkpoint:
    def test_w4_packed_default_roundtrip(self, tmp_path):
        """The DEFAULT int4 at-rest storage (packed uint8 halves — the
        measured W4 rule, PROFILE_r03 §4/§9) survives save -> load with
        identical logits and half-size shard bytes."""
        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w4a4(outlier_budget=8)
        batches = [np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 16))]
        qparams, specs = quantize_model(src, cfg, qcfg, calib_batches=batches)
        assert qparams.blocks[0].attn.wq.q_weight.dtype == jnp.uint8
        save_checkpoint(str(tmp_path), qparams, cfg, qcfg)
        loaded, cfg2, qcfg2 = load_checkpoint(str(tmp_path))
        assert loaded.blocks[0].attn.wq.q_weight.dtype == jnp.uint8
        specs2 = resolve_specs(qcfg2)
        tokens = jnp.ones((1, 4), jnp.int32)

        def run(p, s):
            cache = KVCache.create(cfg.num_hidden_layers, 1, 8,
                                   cfg.num_key_value_heads, cfg.head_dim_,
                                   jnp.bfloat16)
            return _jfwd(p, tokens, cache, specs=s, cfg=cfg)[0]
        np.testing.assert_array_equal(
            np.asarray(run(qparams, specs)), np.asarray(run(loaded, specs2)))

    def test_w4_native_roundtrip(self, tmp_path, monkeypatch):
        """jnp.int4 weights (MIXQ_W4_PACKED=0 storage mode) survive save
        (packed 2-per-byte on disk) -> load with identical logits."""
        import importlib
        ml = importlib.import_module("mixq_tpu.ops.mixed_linear")
        monkeypatch.setattr(ml, "_W4_PACKED", False)
        monkeypatch.setattr(ml, "_INT4_NATIVE", True)
        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w4a4(outlier_budget=8)
        batches = [np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 16))]
        qparams, specs = quantize_model(src, cfg, qcfg, calib_batches=batches)
        assert qparams.blocks[0].attn.wq.q_weight.dtype == jnp.int4
        save_checkpoint(str(tmp_path), qparams, cfg, qcfg)
        # packed on disk: the q_weight shard bytes are half the int8 size
        import json as _json
        with open(tmp_path / "manifest.json") as f:
            man = _json.load(f)
        assert man["weights"]["blocks.0.attn.wq.q_weight"]["dtype"] == "int4_packed"

        loaded, cfg2, qcfg2 = load_checkpoint(str(tmp_path))
        assert loaded.blocks[0].attn.wq.q_weight.dtype == jnp.int4
        specs2 = resolve_specs(qcfg2)
        tokens = jnp.ones((1, 4), jnp.int32)

        def run(p, s):
            cache = KVCache.create(cfg.num_hidden_layers, 1, 8,
                                   cfg.num_key_value_heads, cfg.head_dim_,
                                   jnp.bfloat16)
            return _jfwd(p, tokens, cache, specs=s, cfg=cfg)[0]
        np.testing.assert_array_equal(
            np.asarray(run(qparams, specs)), np.asarray(run(loaded, specs2)))


class TestCheckpointRobustness:
    def test_stacked_params_roundtrip(self, tmp_path):
        """Scan-path (stacked) params must save in the canonical per-block
        layout — engine.warmup_online returns restacked params, so this is a
        reachable save path (round-1 advisor finding: leaves saved under
        'stacked.*' silently loaded back as all-None blocks)."""
        from mixq_tpu.models.decoder import stack_decoder_params

        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w8a8(outlier_budget=8)
        qparams, specs = quantize_model(src, cfg, qcfg)
        stacked = stack_decoder_params(qparams)
        save_checkpoint(str(tmp_path), stacked, cfg, qcfg)

        loaded, cfg2, qcfg2 = load_checkpoint(str(tmp_path))
        assert loaded.blocks[0].attn.wq is not None
        assert loaded.blocks[0].attn.wq.q_weight is not None
        np.testing.assert_array_equal(
            np.asarray(qparams.blocks[1].attn.wk.q_weight),
            np.asarray(loaded.blocks[1].attn.wk.q_weight))

    def test_missing_tensor_raises(self, tmp_path):
        """A checkpoint missing a required linear raises instead of returning
        a silently-None pytree."""
        import json as _json

        cfg = ModelConfig.tiny()
        src = FakeSource(make_hf_style_state(cfg))
        qcfg = QuantConfig.w8a8(outlier_budget=8)
        qparams, _ = quantize_model(src, cfg, qcfg)
        save_checkpoint(str(tmp_path), qparams, cfg, qcfg)
        # corrupt the manifest: drop a required leaf
        with open(tmp_path / "manifest.json") as f:
            man = _json.load(f)
        del man["weights"]["blocks.0.attn.wq.q_weight"]
        with open(tmp_path / "manifest.json", "w") as f:
            _json.dump(man, f)
        with pytest.raises(KeyError):
            load_checkpoint(str(tmp_path))


class TestQuikGroupSizeRejected:
    def test_quik_group_size_raises(self):
        qcfg = dataclasses.replace(QuantConfig.quik_w4a4(), q_group_size=128)
        with pytest.raises(ValueError, match="group"):
            resolve_specs(qcfg)
