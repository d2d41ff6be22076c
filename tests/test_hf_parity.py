"""Numerical parity of the functional decoder vs HuggingFace transformers
(fp32, tiny random models). This is the ground-truth gate that the arch
variants (GQA, rope styles, parallel blocks, qkv fusing) are implemented
correctly — stronger than the reference's approach of reusing HF modules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward
from mixq_tpu.models.hf import TensorSource, config_from_hf, params_from_source
from mixq_tpu.ops.mixed_linear import LinearSpec

FP32 = DecoderSpecs.uniform(LinearSpec(version="FP16", w_bit=16, out_dtype="float32"))

_jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))


def run_parity(hf_model, hf_cfg_dict, tokens_np, atol=2e-3, specs=FP32):
    hf_model = hf_model.eval().float()
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens_np)).logits.numpy()

    cfg = config_from_hf(hf_cfg_dict)
    src = TensorSource.from_torch_state_dict(hf_model.state_dict())
    params = params_from_source(src, cfg, specs, store_dtype=jnp.float32)
    B, T = tokens_np.shape
    cache = KVCache.create(cfg.num_hidden_layers, B, 32,
                           cfg.num_key_value_heads, cfg.head_dim_, jnp.float32)
    logits, _ = _jfwd(params, jnp.asarray(tokens_np), cache, specs=specs, cfg=cfg)
    got = np.asarray(logits)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=atol)
    return cfg, params


def tiny_tokens(vocab, B=2, T=7, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, vocab, (B, T)).astype(np.int32)


class TestLlamaFamily:
    def test_llama_gqa(self):
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
            attention_bias=False, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        model = LlamaForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128))

    def test_llama3_rope_scaling(self):
        """Llama-3.1-style rope_scaling (piecewise frequency rescale) must
        match HF's model end-to-end — unscaled rope on such a checkpoint
        silently computes wrong positions."""
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            rope_theta=10000.0,
            rope_scaling={"rope_type": "llama3", "factor": 8.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 32},
        )
        torch.manual_seed(13)
        model = LlamaForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=13))
        assert mcfg.rope_scaling_type == "llama3"

    def test_linear_rope_scaling(self):
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            rope_scaling={"rope_type": "linear", "factor": 4.0},
        )
        torch.manual_seed(14)
        model = LlamaForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=14))
        assert mcfg.rope_scaling_type == "linear"

    def test_unsupported_rope_scaling_rejected(self):
        from mixq_tpu.models.hf import config_from_hf

        hf = {"model_type": "llama", "vocab_size": 64, "hidden_size": 32,
              "intermediate_size": 64, "num_hidden_layers": 1,
              "num_attention_heads": 2,
              "rope_scaling": {"rope_type": "yarn", "factor": 4.0}}
        import pytest as _pt
        with _pt.raises(ValueError, match="rope_scaling"):
            config_from_hf(hf)

    def test_gemma2(self):
        """Gemma-2: 4-norm blocks (post-attn/post-ffw pre-residual norms),
        attention + final logit softcapping, query_pre_attn_scalar score
        scale, ALTERNATING local/global layers (window exercised: T >
        sliding_window), plus the gemma quirks (embed scale, GeGLU,
        (1+w) norms, tied head)."""
        from transformers import Gemma2Config, Gemma2ForCausalLM

        cfg = Gemma2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=64, sliding_window=4,
            query_pre_attn_scalar=24.0, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            hidden_activation="gelu_pytorch_tanh",
        )
        torch.manual_seed(18)
        model = Gemma2ForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(),
                             tiny_tokens(128, T=9, seed=18), atol=5e-3)
        assert mcfg.post_norms and mcfg.sliding_window_pattern == 2
        assert mcfg.attn_logit_softcap == 50.0
        assert mcfg.final_logit_softcap == 30.0

    def test_qwen3_qk_norm(self):
        """Qwen3: per-head RMSNorm on q/k before RoPE (QK-Norm), explicit
        head_dim, no attention bias."""
        from transformers import Qwen3Config, Qwen3ForCausalLM

        cfg = Qwen3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=128,
        )
        torch.manual_seed(17)
        model = Qwen3ForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=17))
        assert mcfg.qk_norm and mcfg.head_dim_ == 32

    def test_mixtral_moe(self):
        """Mixtral sparse-MoE: HF end-to-end parity (exact-capacity
        routing, FP32) — validates router semantics (softmax -> top-k ->
        renormalize), expert stacking, and the dispatch/combine math on a
        real checkpoint layout."""
        from transformers import MixtralConfig, MixtralForCausalLM

        cfg = MixtralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4,
            num_experts_per_tok=2, max_position_embeddings=128,
            sliding_window=None,
        )
        torch.manual_seed(16)
        model = MixtralForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(),
                             tiny_tokens(128, seed=16), atol=4e-3)
        assert mcfg.num_local_experts == 4
        assert mcfg.num_experts_per_tok == 2

    def test_starcoder2(self):
        """Starcoder2: LayerNorm (+bias) blocks, biased linears, plain
        tanh-GELU MLP, GQA rope — all existing ModelConfig switches."""
        from transformers import Starcoder2Config, Starcoder2ForCausalLM

        cfg = Starcoder2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            use_bias=True, sliding_window=None,
            tie_word_embeddings=False,
        )
        torch.manual_seed(22)
        model = Starcoder2ForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=22))

    def test_phi3(self):
        """Phi-3: packed qkv_proj and gate_up_proj (split at conversion),
        plain rope."""
        from transformers import Phi3Config, Phi3ForCausalLM

        cfg = Phi3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            pad_token_id=0,
        )
        torch.manual_seed(20)
        model = Phi3ForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=20))

    def test_phi3_longrope(self):
        """Phi-3 longrope: per-frequency short/long factor rescale +
        attention-factor cos/sin scale; the parity run's 32-slot cache
        stays under original_max_position, matching HF's short-factor
        init path."""
        from transformers import Phi3Config, Phi3ForCausalLM

        hd2 = 8    # head_dim/2 factors
        cfg = Phi3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            original_max_position_embeddings=64, pad_token_id=0,
            rope_scaling={"type": "longrope",
                          "short_factor": [1.0 + 0.1 * i
                                           for i in range(hd2)],
                          "long_factor": [2.0 + 0.3 * i
                                          for i in range(hd2)]},
        )
        torch.manual_seed(21)
        model = Phi3ForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(),
                             tiny_tokens(128, seed=21), atol=4e-3)
        assert mcfg.rope_scaling_type == "longrope"
        assert mcfg.rope_attention_factor > 1.0

    def test_phi3_partial_rotary_longrope(self):
        """Phi-4-mini-class checkpoint under model_type phi3:
        partial_rotary_factor (rope on the first 3/4 of head_dim) with
        legacy 'su'-typed longrope factors sized to the ROTARY dims."""
        from transformers import Phi3Config, Phi3ForCausalLM

        rot2 = 6    # rotary_dim(12)/2 factors; head_dim 16
        cfg = Phi3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            original_max_position_embeddings=64, pad_token_id=0,
            partial_rotary_factor=0.75,
            rope_scaling={"type": "su",
                          "short_factor": [1.0 + 0.2 * i
                                           for i in range(rot2)],
                          "long_factor": [2.0 + 0.4 * i
                                          for i in range(rot2)]},
        )
        torch.manual_seed(23)
        model = Phi3ForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(),
                             tiny_tokens(128, seed=23), atol=4e-3)
        assert mcfg.rotary_dim == 12
        assert mcfg.rope_scaling_type == "longrope"

    def test_qwen2_moe(self):
        """Qwen2-MoE: fine-grained experts + a sigmoid-gated SHARED expert
        every token passes through; raw (un-renormalized) top-k router
        weights by default."""
        from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

        cfg = Qwen2MoeConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=48, shared_expert_intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_experts=8, num_experts_per_tok=3,
            norm_topk_prob=False, max_position_embeddings=128,
            decoder_sparse_step=1, mlp_only_layers=[],
        )
        torch.manual_seed(19)
        model = Qwen2MoeForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(),
                             tiny_tokens(128, seed=19), atol=4e-3)
        assert mcfg.num_local_experts == 8 and not mcfg.moe_norm_topk

    def test_gemma(self):
        """Gemma: sqrt(hidden) embed scale, (1+w) RMSNorm (folded at
        conversion), GeGLU MLP, explicit head_dim, tied lm_head."""
        from transformers import GemmaConfig, GemmaForCausalLM

        cfg = GemmaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=128,
            hidden_activation="gelu_pytorch_tanh",
        )
        torch.manual_seed(15)
        model = GemmaForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(),
                             tiny_tokens(128, seed=15), atol=4e-3)
        assert mcfg.embed_multiplier == 8.0 and mcfg.gated_mlp
        assert mcfg.head_dim_ == 32 and mcfg.tie_word_embeddings

    def test_llama_tied_embeddings(self):
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
            tie_word_embeddings=True,
        )
        torch.manual_seed(1)
        model = LlamaForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=1))

    def test_qwen2(self):
        from transformers import Qwen2Config, Qwen2ForCausalLM
        cfg = Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, tie_word_embeddings=False,
        )
        torch.manual_seed(2)
        model = Qwen2ForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=2))

    def test_mistral_sliding_window(self):
        from transformers import MistralConfig, MistralForCausalLM
        cfg = MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            sliding_window=4, max_position_embeddings=64,
        )
        torch.manual_seed(3)
        model = MistralForCausalLM(cfg)
        # T > window so the sliding mask actually bites
        run_parity(model, cfg.to_dict(), tiny_tokens(128, T=9, seed=3))


class TestFalcon:
    def test_falcon_mqa_parallel(self):
        from transformers import FalconConfig, FalconForCausalLM
        cfg = FalconConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, multi_query=True, parallel_attn=True,
            bias=False, new_decoder_architecture=False, alibi=False,
        )
        torch.manual_seed(4)
        model = FalconForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=4))

    def test_falcon_new_decoder_gqa(self):
        """falcon-40b/180b style: new_decoder_architecture + GQA."""
        from transformers import FalconConfig, FalconForCausalLM
        cfg = FalconConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_kv_heads=2, parallel_attn=True,
            bias=False, new_decoder_architecture=True, alibi=False,
        )
        torch.manual_seed(12)
        model = FalconForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=12))


class TestOPT:
    def test_opt(self):
        from transformers import OPTConfig, OPTForCausalLM
        cfg = OPTConfig(
            vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=64,
            do_layer_norm_before=True, activation_function="relu",
            word_embed_proj_dim=64,
        )
        torch.manual_seed(11)
        model = OPTForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=11))


class TestGPTJ:
    def test_gptj(self):
        from transformers import GPTJConfig, GPTJForCausalLM
        cfg = GPTJConfig(
            vocab_size=128, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
            n_positions=64,
        )
        torch.manual_seed(5)
        model = GPTJForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=5), atol=5e-3)


class TestQuantizedParity:
    def test_w8a8_llama_close(self):
        """Quantized conversion of a real HF checkpoint stays close to the fp
        logits (the PPL gate in miniature)."""
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        )
        torch.manual_seed(6)
        model = LlamaForCausalLM(cfg).eval().float()
        tokens_np = tiny_tokens(128, seed=6)
        with torch.no_grad():
            ref = model(torch.tensor(tokens_np)).logits.numpy()

        mcfg = config_from_hf(cfg.to_dict())
        src = TensorSource.from_torch_state_dict(model.state_dict())
        specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
        params = params_from_source(src, mcfg, specs)
        cache = KVCache.create(mcfg.num_hidden_layers, 2, 32,
                               mcfg.num_key_value_heads, mcfg.head_dim_,
                               jnp.float32)
        logits, _ = _jfwd(params, jnp.asarray(tokens_np), cache,
                          specs=specs, cfg=mcfg)
        # int8 + bf16: compare softmax total variation, not raw logits
        p_ref = torch.softmax(torch.tensor(ref[:, -1]), dim=-1).numpy()
        p_got = np.asarray(jax.nn.softmax(logits[:, -1], axis=-1))
        tv = 0.5 * np.abs(p_ref - p_got).sum(-1).max()
        assert tv < 0.1, f"total variation {tv}"


class TestAlibi:
    def test_falcon_alibi(self):
        """falcon-rw-style ALiBi (no rotary, additive bias) — exercises the
        alibi path in attend() against HF's build_alibi_tensor reference."""
        from transformers import FalconConfig, FalconForCausalLM
        cfg = FalconConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, multi_query=True, parallel_attn=True,
            bias=False, new_decoder_architecture=False, alibi=True,
        )
        torch.manual_seed(13)
        model = FalconForCausalLM(cfg)
        mcfg, _ = run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=13))
        assert mcfg.alibi and mcfg.rope_style == "none"

    def test_falcon_alibi_nonpow2_heads(self):
        """Non-power-of-2 head count hits the interleaved extra-slope branch
        of the ALiBi slope formula."""
        from transformers import FalconConfig, FalconForCausalLM
        cfg = FalconConfig(
            vocab_size=128, hidden_size=96, num_hidden_layers=1,
            num_attention_heads=6, multi_query=True, parallel_attn=True,
            bias=False, new_decoder_architecture=False, alibi=True,
        )
        torch.manual_seed(14)
        model = FalconForCausalLM(cfg)
        run_parity(model, cfg.to_dict(), tiny_tokens(128, seed=14))

    def test_alibi_decode_matches_prefill(self):
        """Chunked prefill + per-token decode under ALiBi produce the same
        final logits as one full-prompt forward (position handling for the
        relative bias is consistent across cache states)."""
        from mixq_tpu.config import ModelConfig
        from mixq_tpu.models.decoder import forward, init_decoder_params

        cfg = ModelConfig.tiny(alibi=True, rope_style="none",
                               num_attention_heads=4, num_key_value_heads=2)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, FP32)
        toks = tiny_tokens(cfg.vocab_size, B=1, T=8, seed=15)

        cache = KVCache.create(cfg.num_hidden_layers, 1, 16,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.float32)
        full, _ = _jfwd(params, jnp.asarray(toks), cache, specs=FP32, cfg=cfg)

        cache2 = KVCache.create(cfg.num_hidden_layers, 1, 16,
                                cfg.num_key_value_heads, cfg.head_dim_,
                                jnp.float32)
        _, cache2 = _jfwd(params, jnp.asarray(toks[:, :5]), cache2,
                          specs=FP32, cfg=cfg)
        last = None
        for t in range(5, 8):
            last, cache2 = _jfwd(params, jnp.asarray(toks[:, t:t + 1]),
                                 cache2, specs=FP32, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(last[:, 0]), np.asarray(full[:, -1]),
            rtol=1e-4, atol=1e-4)

    def test_baichuan13b_selects_alibi(self):
        """The registry maps a Baichuan-13B-shaped config (40 layers — the
        reference's selection rule, models/baichuan.py:81) to ALiBi."""
        from mixq_tpu.models.hf import config_from_hf
        mcfg = config_from_hf(dict(
            model_type="baichuan", vocab_size=64000, hidden_size=5120,
            intermediate_size=13696, num_hidden_layers=40,
            num_attention_heads=40, model_max_length=4096))
        assert mcfg.alibi and mcfg.rope_style == "none"
        # 7B-shaped baichuan keeps rotary
        mcfg7 = config_from_hf(dict(
            model_type="baichuan", vocab_size=64000, hidden_size=4096,
            intermediate_size=11008, num_hidden_layers=32,
            num_attention_heads=32))
        assert not mcfg7.alibi and mcfg7.rope_style == "neox"
