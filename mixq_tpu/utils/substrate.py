"""Realistic evaluation substrate (VERDICT r3 item 3).

Random-weight models have chance-level PPL, so quantization damage of the
size the accuracy gates exist to catch (the reference's "W8A8O16 within
0.1 of FP16 Wikitext2 PPL", BASELINE.md) disappears into noise, the online
outlier predictor can only be validated on engineered activations, and
speculative decoding never accepts a draft (random weights never repeat an
output n-gram). Real checkpoints don't exist in this environment; this
module BUILDS deterministic substrates that recover each property the
reference's methodology relies on (benchbitsand.py:32-34 benches on saved
REAL activations; smooth_quant_get_act.py:13-51 calibrates on real Pile
activations):

  synth_corpus           a learnable synthetic language: Zipf-weighted
                         phrase book over a Zipf vocab -> token stream
                         with real n-gram statistics (repetition, skew)
  train_tiny_lm          trains OUR decoder (models/decoder.forward) on
                         the corpus with optax on CPU — a few hundred
                         steps take minutes at tiny scale and land PPL
                         far below chance, so quantization error moves
                         the number instead of vanishing into it
  plant_outlier_channels FUNCTION-PRESERVING outlier injection into a
                         trained model: scale norm gains / producer
                         columns by g, divide the consumer weight rows by
                         g — the activation channel is genuinely g x
                         larger (sticky, like real LLM outliers that ride
                         LayerNorm gains) while fp logits are unchanged,
                         so the predictor must FIND them and the gate
                         prices what int quantization loses on them
  make_markov_state      a cfg-SHAPED (e.g. 7B) model whose generations
                         follow a planted Markov chain: embed/lm_head
                         solve a least-squares readout of the chain,
                         decoder blocks carry ~zero signal. Full-size
                         compute with n-gram-repetitive output — the
                         substrate speculative serving needs for nonzero
                         acceptance at 7B shapes.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from mixq_tpu.config import ModelConfig

__all__ = [
    "synth_corpus", "train_tiny_lm", "hf_state_from_params",
    "plant_outlier_channels", "make_markov_state", "substrate_cfg",
]


def substrate_cfg(preset: str = "tiny") -> ModelConfig:
    """Model shapes for the trained substrates (small enough for CPU
    training, deep enough that per-layer quantization error compounds)."""
    shapes = {
        "tiny": dict(hidden_size=256, intermediate_size=704,
                     num_hidden_layers=4, num_attention_heads=4,
                     num_key_value_heads=4, vocab_size=2048,
                     max_position_embeddings=512),
        "mid": dict(hidden_size=512, intermediate_size=1408,
                    num_hidden_layers=6, num_attention_heads=8,
                    num_key_value_heads=8, vocab_size=4096,
                    max_position_embeddings=512),
    }
    return ModelConfig(model_type="llama", tie_word_embeddings=False,
                       **shapes[preset])


# ---------------------------------------------------------------------------
# Corpus
# ---------------------------------------------------------------------------

def synth_corpus(
    vocab_size: int,
    n_tokens: int,
    seed: int = 0,
    n_phrases: int = 384,
    phrase_len: Tuple[int, int] = (3, 9),
    noise: float = 0.03,
    sample_seed: Optional[int] = None,
) -> np.ndarray:
    """Deterministic synthetic language: a phrase book of `n_phrases` fixed
    token sequences (tokens Zipf-distributed over the vocab), emitted with a
    Zipf phrase distribution plus `noise` fraction of uniform-random tokens.

    Properties that matter downstream: low entropy (learnable by a tiny LM),
    heavy token-frequency skew, and verbatim n-gram repetition (the
    structure both the tokenizer-level PPL gate and the n-gram speculative
    drafter feed on). Token 1 is reserved as BOS (the perplexity harness
    substitutes it at window starts, reference perplexity_utils.py:184-187).

    `seed` fixes the LANGUAGE (phrase book); `sample_seed` (default: seed)
    varies only the emission stream — held-out evaluation text must come
    from the SAME language with a different sample_seed.
    """
    rng_book = np.random.RandomState(seed)
    rng = np.random.RandomState(seed if sample_seed is None else sample_seed)
    # Zipf token weights over [2, vocab): 0 = pad, 1 = BOS stay reserved
    toks = np.arange(2, vocab_size)
    tok_p = 1.0 / (np.arange(len(toks)) + 2.0) ** 1.1
    tok_p /= tok_p.sum()
    phrases = [
        rng_book.choice(toks, size=rng_book.randint(*phrase_len), p=tok_p)
        for _ in range(n_phrases)
    ]
    phrase_p = 1.0 / (np.arange(n_phrases) + 2.0) ** 1.05
    phrase_p /= phrase_p.sum()

    out = np.empty(n_tokens + 16, np.int32)
    i = 0
    while i < n_tokens:
        if rng.rand() < noise:
            out[i] = rng.choice(toks, p=tok_p)
            i += 1
            continue
        ph = phrases[rng.choice(n_phrases, p=phrase_p)]
        n = min(len(ph), len(out) - i)
        out[i:i + n] = ph[:n]
        i += n
    return out[:n_tokens]


# ---------------------------------------------------------------------------
# Training (CPU, minutes at tiny scale)
# ---------------------------------------------------------------------------

def train_tiny_lm(
    cfg: ModelConfig,
    corpus: np.ndarray,
    steps: int = 400,
    batch: int = 16,
    seq_len: int = 128,
    lr: float = 3e-3,
    seed: int = 0,
    log_every: int = 0,
):
    """Train the functional decoder on `corpus` with Adam (fp32). Returns
    (DecoderParams fp32, final_loss). Dogfoods models/decoder.forward — the
    same code path the inference gates exercise — so a trained checkpoint
    is guaranteed loadable by the rest of the stack."""
    import jax
    import jax.numpy as jnp
    import optax

    from mixq_tpu.models import DecoderSpecs, KVCache
    from mixq_tpu.models.decoder import forward, init_decoder_params
    from mixq_tpu.ops.mixed_linear import LinearSpec

    specs = DecoderSpecs.uniform(
        LinearSpec(version="FP16", w_bit=16, out_dtype="float32"))
    params = init_decoder_params(jax.random.PRNGKey(seed), cfg, specs,
                                 dtype=jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params, tokens):
        cache = KVCache.create(cfg.num_hidden_layers, batch, seq_len,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.float32)
        logits, _ = forward(params, tokens[:, :-1], cache, specs, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return nll.mean()

    @jax.jit
    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed + 1)
    n_windows = len(corpus) - (seq_len + 1)
    loss = None
    for step in range(steps):
        starts = rng.randint(0, n_windows, batch)
        tokens = jnp.asarray(
            np.stack([corpus[s:s + seq_len + 1] for s in starts]))
        params, opt_state, loss = train_step(params, opt_state, tokens)
        if log_every and (step + 1) % log_every == 0:
            print(f"# substrate train step {step+1}/{steps} "
                  f"loss {float(loss):.4f}", flush=True)
    return params, float(loss)


def hf_state_from_params(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """DecoderParams (FP16/fp32 specs) -> HF-llama-style numpy state dict,
    the inverse of models/hf.py for the llama scheme. Lets a trained
    substrate flow through the UNCHANGED production pipeline
    (quantize_model -> save/load_checkpoint -> engines)."""
    def w(p):           # ours [in, out] -> HF [out, in]
        return np.asarray(p.q_weight, np.float32).T

    d = {
        "model.embed_tokens.weight": np.asarray(params.embed, np.float32),
        "model.norm.weight": np.asarray(params.lnf_scale, np.float32),
    }
    if params.lm_head is not None:
        d["lm_head.weight"] = np.asarray(params.lm_head, np.float32).T
    for i, bp in enumerate(params.blocks):
        p = f"model.layers.{i}."
        d[p + "input_layernorm.weight"] = np.asarray(bp.ln1_scale, np.float32)
        d[p + "post_attention_layernorm.weight"] = np.asarray(
            bp.ln2_scale, np.float32)
        d[p + "self_attn.q_proj.weight"] = w(bp.attn.wq)
        d[p + "self_attn.k_proj.weight"] = w(bp.attn.wk)
        d[p + "self_attn.v_proj.weight"] = w(bp.attn.wv)
        d[p + "self_attn.o_proj.weight"] = w(bp.attn.wo)
        d[p + "mlp.up_proj.weight"] = w(bp.mlp.up)
        d[p + "mlp.gate_proj.weight"] = w(bp.mlp.gate)
        d[p + "mlp.down_proj.weight"] = w(bp.mlp.down)
    return d


# ---------------------------------------------------------------------------
# Function-preserving outlier planting
# ---------------------------------------------------------------------------

def plant_outlier_channels(
    state: Dict[str, np.ndarray],
    cfg: ModelConfig,
    channels: Sequence[int],
    gain: float = 8.0,
    inner_channels: Optional[Sequence[int]] = None,
) -> Dict[str, np.ndarray]:
    """Inject REAL sticky activation-outlier channels into a trained model
    without changing its function (fp logits identical up to rounding).

    Residual-stream channels `channels` ride the norm gains: scaling
    input_layernorm.weight[c] (and post_attention_layernorm.weight[c]) by
    `gain` makes the NORMALIZED activation channel genuinely gain x larger
    — exactly how real LLM outlier channels arise — while dividing column c
    of every consumer weight (q/k/v, up/gate) by `gain` preserves the
    product. `inner_channels` does the same for the MLP inner dim (up_proj
    output col x gain, down_proj input row / gain; the gate path is
    untouched so the elementwise product scales linearly).

    The predictor sees true |x| > sigma outliers; the PPL gate prices what
    int-only quantization loses on them; fp16 evaluation is unchanged.
    Mutates and returns `state`. (Reference behavior being reproduced: the
    sticky channel locality MixLibCache exploits, Cache.py:6-22 /
    linear.py:200-227.)
    """
    g = np.float32(gain)
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        ln1 = state[p + "input_layernorm.weight"]
        ln2 = state[p + "post_attention_layernorm.weight"]
        for c in channels:
            ln1[c] *= g
            ln2[c] *= g
            for name in ("self_attn.q_proj", "self_attn.k_proj",
                         "self_attn.v_proj"):
                state[p + name + ".weight"][:, c] /= g      # HF [out, in]
            for name in ("mlp.up_proj", "mlp.gate_proj"):
                state[p + name + ".weight"][:, c] /= g
        inner = () if inner_channels is None else inner_channels
        for c in inner:
            state[p + "mlp.up_proj.weight"][c, :] *= g      # output channel
            state[p + "mlp.down_proj.weight"][:, c] /= g    # input row
    return state


# ---------------------------------------------------------------------------
# Markov LM at arbitrary (e.g. 7B) shapes — the speculative-serving substrate
# ---------------------------------------------------------------------------

def make_markov_state(
    cfg: ModelConfig,
    v_eff: int = 512,
    seed: int = 0,
    margin: float = 30.0,
    block_scale: float = 5e-4,
    mean_cycle: int = 48,
    share_blocks: bool = False,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Build an HF-style state dict for a cfg-SHAPED model whose greedy
    generations follow a planted first-order Markov chain over tokens
    [2, v_eff): full-size GEMM/attention compute, deterministic
    n-gram-repetitive output (chains enter cycles of ~`mean_cycle` tokens,
    so the n-gram drafter's history hits repeat — nonzero speculative
    acceptance at any model size, the property random 7B weights can never
    provide, SERVE_SPEC_r03.json drafted=0).

    Readout construction: embed rows for effective tokens are unit-scale
    gaussians; lm_head solves the regularized least squares
    rmsnorm(embed[t]) @ W ~= margin * onehot(succ[t]) (exact since
    v_eff << hidden); decoder blocks get `block_scale`-scaled weights so
    the residual stream stays embedding-dominated and the argmax margin
    survives their noise. Returns (state, succ[v_eff] successor table).
    """
    rng = np.random.RandomState(seed)
    H, V = cfg.hidden_size, cfg.vocab_size
    assert v_eff <= min(V, H), "readout solve needs v_eff <= hidden_size"

    # successor table: mostly a shuffle through small cycles (cycle length
    # ~ mean_cycle) so histories revisit n-grams quickly
    succ = np.zeros(v_eff, np.int64)
    toks = np.arange(2, v_eff)
    rng.shuffle(toks)
    i = 0
    while i < len(toks):
        n = max(3, int(rng.poisson(mean_cycle)))
        cyc = toks[i:i + n]
        for a, b in zip(cyc, np.roll(cyc, -1)):
            succ[a] = b
        i += n
    succ[0] = succ[1] = 2   # pad/BOS fall into the chain

    embed = (rng.randn(V, H) * 0.02).astype(np.float32)
    E = rng.randn(v_eff, H).astype(np.float32)          # unit-scale rows
    embed[:v_eff] = E
    # final-norm output for token t (norm weight = 1)
    X = E / np.sqrt((E ** 2).mean(axis=1, keepdims=True) + 1e-5)
    M = np.zeros((v_eff, v_eff), np.float32)
    M[np.arange(v_eff), succ] = margin
    # W = X^T (X X^T + eps I)^-1 M  — exact underdetermined solve
    G = X @ X.T + 1e-3 * np.eye(v_eff, dtype=np.float32)
    W = X.T @ np.linalg.solve(G, M)                     # [H, v_eff]
    lm_head = (rng.randn(V, H) * 1e-4).astype(np.float32)  # HF [V, H]
    lm_head[:v_eff] = W.T

    state = {
        "model.embed_tokens.weight": embed,
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": lm_head,
    }
    I = cfg.intermediate_size
    nq, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim_)
    s = np.float32(block_scale)
    # share_blocks: every layer maps to the SAME numpy arrays — at 7B the
    # f32 state would otherwise be ~26GB of host RAM; the serving/spec
    # substrate only needs full-size compute and a stable readout, not
    # layer diversity (quantization still materializes per-layer device
    # params downstream)
    one = {
        "input_layernorm.weight": np.ones(H, np.float32),
        "post_attention_layernorm.weight": np.ones(H, np.float32),
        "self_attn.q_proj.weight": rng.randn(nq * hd, H).astype(
            np.float32) * s,
        "self_attn.k_proj.weight": rng.randn(nkv * hd, H).astype(
            np.float32) * s,
        "self_attn.v_proj.weight": rng.randn(nkv * hd, H).astype(
            np.float32) * s,
        "self_attn.o_proj.weight": rng.randn(H, nq * hd).astype(
            np.float32) * s,
        "mlp.gate_proj.weight": rng.randn(I, H).astype(np.float32) * s,
        "mlp.up_proj.weight": rng.randn(I, H).astype(np.float32) * s,
        "mlp.down_proj.weight": rng.randn(H, I).astype(np.float32) * s,
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        if share_blocks:
            for name, arr in one.items():
                state[p + name] = arr
        else:
            state[p + "input_layernorm.weight"] = np.ones(H, np.float32)
            state[p + "post_attention_layernorm.weight"] = np.ones(
                H, np.float32)
            for name in ("self_attn.q_proj", "self_attn.k_proj",
                         "self_attn.v_proj", "self_attn.o_proj",
                         "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"):
                shape = one[name + ".weight"].shape
                state[p + name + ".weight"] = rng.randn(*shape).astype(
                    np.float32) * s
    return state, succ
