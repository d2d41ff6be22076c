"""Per-op accounting of the headline decode step (VERDICT r3 item 1).

The B=512 S=32 bf16-XLA W8A8 step measured 37.3ms while its int8-GEMM
compute floor is ~17.5ms (PROFILE_r03.md §3); nothing accounted for the
other ~20ms. This probe decomposes the step IN ONE PROCESS (relay rule:
cross-process timings don't compare) by chain-timing, at the same B and
7B shapes:

  full_L1 / full_L2   the real decode step at 1 and 2 layers; the
                      difference is the true marginal per-layer cost and
                      full_L1 - marginal is the base (embed + lm_head +
                      argmax + dispatch)
  gemm_layer          norm + quant + the 7 int8 GEMMs of one layer with
                      attention stubbed out (q reshaped straight to the
                      o_proj input) — the GEMM+quant slice of a layer
  gemm_layer_fp16     same chain with bf16 GEMMs (no quant machinery):
                      prices the int8 win / quant overhead
  attn_layer          KV write + XLA attend only (q/k/v reshaped from the
                      carried activation)
  quant_pass          one rmsnorm + per-token int8 quant + dequant pass
  head_only           final norm + lm_head GEMM + argmax + embed gather

Sum of parts need not equal the whole (XLA fuses/overlaps across seams);
the point is ranking the residual. Env: PROBE_B (512), PROBE_S (32),
PROBE_KV (bfloat16), PROBE_CHAIN (16), PROBE_ROUNDS (2),
PROBE_PARTS (csv filter).

Reference for the methodology: PROFILE_r03.md §3; reference bar
README.md:69-76 (A100 10,609.8 tok/s at this workload).
"""
import functools
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import llama2_7b_cfg
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.models.layers import attend, rmsnorm
from mixq_tpu.ops.mixed_linear import (
    LinearSpec, mixed_linear, mixed_linear_prepared, prepare_act,
)

B = int(os.environ.get("PROBE_B", "512"))
S = int(os.environ.get("PROBE_S", "32"))
KV = jnp.dtype(os.environ.get("PROBE_KV", "bfloat16"))
CHAIN = int(os.environ.get("PROBE_CHAIN", "16"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "2"))
PARTS = os.environ.get(
    "PROBE_PARTS",
    "full_L1,full_L2,gemm_layer,gemm_layer_fp16,attn_layer,quant_pass,"
    "head_only").split(",")

W8 = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
FP16 = DecoderSpecs.fp16()


def chain_time(step, carry):
    """Relay chain-timing: dependent steps ended by one device_get, two
    lengths, differenced (CLAUDE.md discipline)."""
    carry = step(carry)                      # compile + first step
    jax.block_until_ready(jax.device_get(jax.tree.leaves(carry)[0]))

    def run(n, carry):
        t0 = time.time()
        for _ in range(n):
            carry = step(carry)
        jax.block_until_ready(jax.device_get(jax.tree.leaves(carry)[0]))
        return time.time() - t0, carry

    _, carry = run(4, carry)
    t1, carry = run(CHAIN, carry)
    t2, carry = run(2 * CHAIN, carry)
    return max((t2 - t1) / CHAIN, 1e-9) * 1e3, carry


class Part:
    def __init__(self, name, step, carry0):
        self.name, self.step, self.carry0 = name, step, carry0
        self.best_ms = float("inf")

    def time_once(self):
        ms, _ = chain_time(self.step, self.carry0())
        self.best_ms = min(self.best_ms, ms)
        return ms


def make_full(n_layers):
    cfg = llama2_7b_cfg(n_layers)
    params = jax.device_put(init_decoder_params(
        jax.random.PRNGKey(0), cfg, W8, dtype=jnp.bfloat16))
    jax.block_until_ready(params)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode(params, tokens, cache):
        logits, cache = forward(params, tokens, cache, W8, cfg)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    def step(carry):
        nxt, cache = carry
        return decode(params, nxt[:, None], cache)

    def carry0():
        cache = KVCache.create(n_layers, B, S, cfg.num_key_value_heads,
                               cfg.head_dim_, KV)
        return jnp.ones((B,), jnp.int32), cache

    return Part(f"full_L{n_layers}", step, carry0)


def make_gemm_layer(specs, name):
    cfg = llama2_7b_cfg(1)
    params = jax.device_put(init_decoder_params(
        jax.random.PRNGKey(0), cfg, specs, dtype=jnp.bfloat16))
    jax.block_until_ready(params)
    bp_spec = (specs.wqkv, specs.wo, specs.up, specs.gate, specs.down)

    @jax.jit
    def layer(params, x):
        bp = params.blocks[0]
        wqkv, wo, up_s, gate_s, down_s = bp_spec
        h = rmsnorm(x, bp.ln1_scale)
        if wqkv.version == "FP16":
            q = mixed_linear(bp.attn.wq, h, wqkv)
            k = mixed_linear(bp.attn.wk, h, wqkv)
            v = mixed_linear(bp.attn.wv, h, wqkv)
        else:
            act = prepare_act(h, bp.attn.wq, wqkv)
            q = mixed_linear_prepared(bp.attn.wq, act, wqkv)
            k = mixed_linear_prepared(bp.attn.wk, act, wqkv)
            v = mixed_linear_prepared(bp.attn.wv, act, wqkv)
        # attention stub: keep q/k/v live via a cheap combine so none of
        # the three GEMMs is DCE'd, then o_proj quantizes inline as in the
        # real layer (unfused=True semantics)
        attn_raw = q + 0.0009765625 * (k + v)
        attn_out = mixed_linear(bp.attn.wo, attn_raw, wo)
        x = x + attn_out.astype(x.dtype)
        h2 = rmsnorm(x, bp.ln2_scale)
        if up_s.version == "FP16":
            up = mixed_linear(bp.mlp.up, h2, up_s)
            gate = mixed_linear(bp.mlp.gate, h2, gate_s)
        else:
            act2 = prepare_act(h2, bp.mlp.up, up_s)
            up = mixed_linear_prepared(bp.mlp.up, act2, up_s)
            gate = mixed_linear_prepared(bp.mlp.gate, act2, gate_s)
        inner = (gate.astype(jnp.float32) * up.astype(jnp.float32)
                 ).astype(up.dtype)
        down = mixed_linear(bp.mlp.down, inner, down_s)
        return x + down.astype(x.dtype)

    def step(x):
        return layer(params, x)

    return Part(name, step, lambda: jnp.ones((B, 1, 4096), jnp.bfloat16))


def make_attn_layer():
    cfg = llama2_7b_cfg(1)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def attn_step(x, cache):
        n_q, hd = cfg.num_attention_heads, cfg.head_dim_
        q = x.reshape(B, 1, n_q, hd)
        k = x.reshape(B, 1, n_q, hd) * 0.5
        v = x.reshape(B, 1, n_q, hd) * 0.25
        cache = cache.update_layer(0, k, v)
        k_c, v_c, ks_c, vs_c = cache.layer_kv(0)
        q_slot = cache.length + jnp.arange(1, dtype=jnp.int32)
        out = attend(q, k_c, v_c, q_slot, cache.length + 1,
                     k_scale=ks_c, v_scale=vs_c)
        cache = cache.advance(1)
        return out.reshape(B, 1, n_q * hd).astype(jnp.bfloat16), cache

    def step(carry):
        return attn_step(*carry)

    def carry0():
        cache = KVCache.create(1, B, S, cfg.num_key_value_heads,
                               cfg.head_dim_, KV)
        return jnp.ones((B, 1, 4096), jnp.bfloat16), cache

    return Part("attn_layer", step, carry0)


def make_quant_pass():
    from mixq_tpu.ops import quant as Q
    scale_w = jnp.ones((4096,), jnp.bfloat16)

    @jax.jit
    def qdq(x, w):
        h = rmsnorm(x, w)
        q, s = Q.quantize_act_per_token(h)
        return (q.astype(jnp.bfloat16) * s).astype(jnp.bfloat16)

    return Part("quant_pass", lambda x: qdq(x, scale_w),
                lambda: jnp.ones((B, 1, 4096), jnp.bfloat16))


def make_head_only():
    cfg = llama2_7b_cfg(1)
    key = jax.random.PRNGKey(1)
    embed = jax.device_put(
        jax.random.normal(key, (cfg.vocab_size, 4096), jnp.bfloat16) * 0.02)
    head = jax.device_put(
        jax.random.normal(key, (4096, cfg.vocab_size), jnp.bfloat16) * 0.02)
    scale = jnp.ones((4096,), jnp.bfloat16)

    @jax.jit
    def head_step(embed, head, scale, x):
        h = rmsnorm(x, scale)
        logits = jnp.dot(h.astype(jnp.bfloat16), head,
                         preferred_element_type=jnp.float32)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        return jnp.take(embed, nxt, axis=0)[:, None].astype(jnp.bfloat16)

    return Part("head_only", lambda x: head_step(embed, head, scale, x),
                lambda: jnp.ones((B, 1, 4096), jnp.bfloat16))


def main():
    makers = {
        "full_L1": lambda: make_full(1),
        "full_L2": lambda: make_full(2),
        "gemm_layer": lambda: make_gemm_layer(W8, "gemm_layer"),
        "gemm_layer_fp16": lambda: make_gemm_layer(FP16, "gemm_layer_fp16"),
        "attn_layer": make_attn_layer,
        "quant_pass": make_quant_pass,
        "head_only": make_head_only,
    }
    parts = []
    for name in PARTS:
        t0 = time.time()
        try:
            p = makers[name]()
            p.time_once()
        except Exception as e:                 # noqa: BLE001
            print(json.dumps({"part": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        print(f"# {name}: compile+time {time.time()-t0:.0f}s "
              f"first={p.best_ms:.3f}ms", file=sys.stderr, flush=True)
        parts.append(p)
    for _ in range(ROUNDS - 1):
        for p in parts:
            p.time_once()
    out = {p.name: round(p.best_ms, 3) for p in parts}
    for p in parts:
        print(json.dumps({"part": p.name, "B": B, "S": S, "kv": str(KV),
                          "ms": round(p.best_ms, 3)}), flush=True)
    if "full_L2" in out and "full_L1" in out:
        marginal = out["full_L2"] - out["full_L1"]
        print(json.dumps({
            "part": "derived", "marginal_layer_ms": round(marginal, 3),
            "base_ms": round(out["full_L1"] - marginal, 3),
            "step32_pred_ms": round(out["full_L1"] + 31 * marginal, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
