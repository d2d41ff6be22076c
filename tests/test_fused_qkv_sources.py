"""Conversion correctness for fused-qkv checkpoint formats (Baichuan W_pack,
ChatGLM query_key_value + packed gate|up MLP) — no transformers
implementations exist offline for these, so the oracle is explicit math on
the synthetic weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward
from mixq_tpu.models.hf import config_from_hf, params_from_source


class DictSource:
    def __init__(self, d):
        self.d = d

    def get(self, k):
        return self.d[k]

    def has(self, k):
        return k in self.d


FP32 = DecoderSpecs.uniform(
    __import__("mixq_tpu.ops.mixed_linear", fromlist=["LinearSpec"])
    .LinearSpec(version="FP16", w_bit=16, out_dtype="float32"))


def test_baichuan_wpack_split():
    """W_pack rows [q|k|v] must land in wq/wk/wv with correct values."""
    H, n_q, hd = 16, 4, 4
    rng = np.random.RandomState(0)
    wq = rng.randn(n_q * hd, H).astype(np.float32)
    wk = rng.randn(n_q * hd, H).astype(np.float32)
    wv = rng.randn(n_q * hd, H).astype(np.float32)
    wpack = np.concatenate([wq, wk, wv], axis=0)

    d = {
        "model.embed_tokens.weight": rng.randn(32, H).astype(np.float32),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": rng.randn(32, H).astype(np.float32),
        "model.layers.0.input_layernorm.weight": np.ones(H, np.float32),
        "model.layers.0.post_attention_layernorm.weight": np.ones(H, np.float32),
        "model.layers.0.self_attn.W_pack.weight": wpack,
        "model.layers.0.self_attn.o_proj.weight": rng.randn(H, n_q * hd).astype(np.float32),
        "model.layers.0.mlp.gate_proj.weight": rng.randn(32, H).astype(np.float32),
        "model.layers.0.mlp.up_proj.weight": rng.randn(32, H).astype(np.float32),
        "model.layers.0.mlp.down_proj.weight": rng.randn(H, 32).astype(np.float32),
    }
    cfg = config_from_hf({
        "model_type": "baichuan", "vocab_size": 32, "hidden_size": H,
        "intermediate_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": n_q, "rms_norm_eps": 1e-5,
    })
    params = params_from_source(DictSource(d), cfg, FP32,
                                store_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(params.blocks[0].attn.wq.q_weight),
                               wq.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params.blocks[0].attn.wk.q_weight),
                               wk.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params.blocks[0].attn.wv.q_weight),
                               wv.T, rtol=1e-6)


def test_chatglm_conversion_runs():
    """ChatGLM: fused query_key_value (MQA), packed [gate|up] MLP, rope half."""
    H, n_q, n_kv, hd, I, V = 16, 4, 2, 4, 24, 64
    rng = np.random.RandomState(1)
    d = {
        "transformer.embedding.word_embeddings.weight":
            rng.randn(V, H).astype(np.float32) * 0.1,
        "transformer.encoder.final_layernorm.weight": np.ones(H, np.float32),
        "transformer.output_layer.weight": rng.randn(V, H).astype(np.float32) * 0.1,
        "transformer.encoder.layers.0.input_layernorm.weight":
            np.ones(H, np.float32),
        "transformer.encoder.layers.0.post_attention_layernorm.weight":
            np.ones(H, np.float32),
        "transformer.encoder.layers.0.self_attention.query_key_value.weight":
            rng.randn((n_q + 2 * n_kv) * hd, H).astype(np.float32) * 0.1,
        "transformer.encoder.layers.0.self_attention.query_key_value.bias":
            rng.randn((n_q + 2 * n_kv) * hd).astype(np.float32) * 0.1,
        "transformer.encoder.layers.0.self_attention.dense.weight":
            rng.randn(H, n_q * hd).astype(np.float32) * 0.1,
        "transformer.encoder.layers.0.mlp.dense_h_to_4h.weight":
            rng.randn(2 * I, H).astype(np.float32) * 0.1,
        "transformer.encoder.layers.0.mlp.dense_4h_to_h.weight":
            rng.randn(H, I).astype(np.float32) * 0.1,
    }
    cfg = config_from_hf({
        "model_type": "chatglm", "padded_vocab_size": V, "hidden_size": H,
        "ffn_hidden_size": I, "num_hidden_layers": 1,
        "num_attention_heads": n_q, "multi_query_attention": True,
        "multi_query_group_num": n_kv, "kv_channels": hd,
        "layernorm_epsilon": 1e-5,
    })
    assert cfg.num_key_value_heads == n_kv
    assert cfg.rope_style == "gptj" and cfg.rotary_dim == hd // 2
    params = params_from_source(DictSource(d), cfg, FP32,
                                store_dtype=jnp.float32)
    # gate|up split: first I rows -> gate, next I -> up
    full = d["transformer.encoder.layers.0.mlp.dense_h_to_4h.weight"]
    np.testing.assert_allclose(np.asarray(params.blocks[0].mlp.gate.q_weight),
                               full[:I].T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params.blocks[0].mlp.up.q_weight),
                               full[I:].T, rtol=1e-6)
    # qkv bias split came along
    assert params.blocks[0].attn.wq.bias is not None

    tokens = jnp.ones((1, 5), jnp.int32)
    cache = KVCache.create(1, 1, 8, n_kv, hd, jnp.float32)
    logits, _ = forward(params, tokens, cache, FP32, cfg)
    assert logits.shape == (1, 5, V)
    assert not np.any(np.isnan(np.asarray(logits)))
