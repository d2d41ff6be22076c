"""Sparse mixture-of-experts MLP (Mixtral family) — a capability the
reference framework does not have at all (its registry is dense-only,
mixquant/models/auto.py:6-15); built TPU-first:

  - experts live as STACKED tensors [E, K, N] so the whole expert pass is
    ONE batched dot_general on the MXU (no per-expert Python loop, no
    ragged shapes);
  - routing uses static-capacity dispatch/combine einsums (the classic
    Shazeer formulation): every shape is compile-time constant, so the
    compiled program never changes as routing decisions change;
  - expert weights quantize like the dense linears (symmetric per-out-
    channel int8; activations per-token int8 for the W8A8 path) — the
    outlier machinery is deliberately NOT applied per expert: routed
    activations are already magnitude-filtered by the router, and a
    per-expert outlier budget would multiply the padded fp GEMMs by E.

Capacity semantics: capacity_factor <= 0 (the default) allocates C = S
slots per expert — EXACT inference (no token ever dropped, any routing
distribution fits). A positive factor bounds C = ceil(S/E * k * factor)
for throughput at the cost of dropped (zero-contribution) tokens when
routing is skewed, which is the standard serving trade.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mixq_tpu.ops import quant as Q
from mixq_tpu.ops.mixed_linear import LinearSpec


class ExpertLinearParams(NamedTuple):
    """Stacked per-expert linear: q_weight [E, K, N] (int8, or bf16 for
    FP16 specs), w_scale [E, N] f32 (None for FP16)."""

    q_weight: jax.Array
    w_scale: Optional[jax.Array]


class MoEParams(NamedTuple):
    router: jax.Array              # [H, E] fp router weights
    gate: ExpertLinearParams       # [E, H, I] (mixtral w1)
    up: ExpertLinearParams         # [E, H, I] (mixtral w3)
    down: ExpertLinearParams       # [E, I, H] (mixtral w2)
    # qwen2-moe SHARED expert: a dense SwiGLU every token passes through,
    # its output scaled by sigmoid(x @ shared_route)
    shared_gate: Optional[object] = None   # MixLinearParams [H, I_sh]
    shared_up: Optional[object] = None
    shared_down: Optional[object] = None
    shared_route: Optional[jax.Array] = None   # [H, 1] fp


def expert_from_float(w_ekn: jax.Array, spec: LinearSpec,
                      store_dtype=jnp.bfloat16) -> ExpertLinearParams:
    """Quantize stacked expert weights [E, K, N] per (expert, out-channel).
    int8 for MIX/QUIK/WEIGHT_ONLY specs (w_bit>=8 semantics; int4 storage
    is a dense-linear feature), bf16 passthrough for FP16."""
    if spec.version == "FP16":
        return ExpertLinearParams(w_ekn.astype(store_dtype), None)
    w = w_ekn.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-8)  # [E, N]
    q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127)
    return ExpertLinearParams(q.astype(jnp.int8), scale)


def expert_linear(p: ExpertLinearParams, x_eck: jax.Array,
                  spec: LinearSpec) -> jax.Array:
    """[E, C, K] x [E, K, N] -> [E, C, N] f32, one batched dot_general.

    W8A8: activations quantize per (expert, slot) row and the int8 bits
    feed the MXU directly (i8 x i8 -> i32), epilogue x_scale * w_scale.
    WEIGHT_ONLY: int8 weights widened once, bf16 MXU dot.
    FP16: bf16 dot."""
    if p.w_scale is None:                                    # FP16
        return jax.lax.dot_general(
            x_eck.astype(p.q_weight.dtype), p.q_weight,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    if spec.version == "WEIGHT_ONLY" or spec.a_bit > 8:
        w = p.q_weight.astype(jnp.bfloat16) * \
            p.w_scale[:, None, :].astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x_eck.astype(jnp.bfloat16), w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    xq, xs = Q.quantize_act_per_token(x_eck)                 # [E,C,K],[E,C,1]
    acc = jax.lax.dot_general(
        xq, p.q_weight, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                    # [E, C, N]
    return acc.astype(jnp.float32) * xs * p.w_scale[:, None, :]


def moe_capacity(n_tokens: int, n_experts: int, top_k: int,
                 factor: float) -> int:
    """Per-expert slot count. factor <= 0 -> exact (C = n_tokens)."""
    if factor <= 0:
        return n_tokens
    return min(n_tokens,
               max(top_k, math.ceil(n_tokens * top_k / n_experts * factor)))


def moe_mlp(x: jax.Array, p: MoEParams, spec_up: LinearSpec,
            spec_down: LinearSpec, top_k: int,
            capacity_factor: float = 0.0,
            act: str = "silu", norm_topk: bool = True) -> jax.Array:
    """Sparse-MoE SwiGLU MLP over [B, T, H] (HF MixtralSparseMoeBlock
    semantics: softmax over ALL experts, top-k, then renormalize when
    norm_topk — qwen2-moe keeps raw softmax weights). A qwen2-moe shared
    expert (dense SwiGLU gated by sigmoid(x @ shared_route)) adds in at
    the end."""
    B, T, H = x.shape
    S = B * T
    E = p.router.shape[1]
    xs = x.reshape(S, H)

    logits = xs.astype(jnp.float32) @ p.router.astype(jnp.float32)  # [S, E]
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_e = jax.lax.top_k(probs, top_k)               # [S, k]
    if norm_topk:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    # static-capacity dispatch: each (token, choice) claims the next free
    # slot of its expert; slots >= C drop (factor<=0 makes C=S: no drops).
    # Index-based (scatter tokens in, gather results out) — the classic
    # one-hot dispatch/combine einsums cost O(S*k*E*C) memory (GBs at
    # prefill scale); the index form is O(E*C + S*k*H).
    C = moe_capacity(S, E, top_k, capacity_factor)
    sel = jax.nn.one_hot(top_e, E, dtype=jnp.int32)          # [S, k, E]
    # position of each (token, choice) within its expert's queue — count
    # earlier tokens (all their choices) plus this token's earlier choices
    earlier_tokens = jnp.cumsum(jnp.sum(sel, axis=1), axis=0) \
        - jnp.sum(sel, axis=1)                               # [S, E]
    earlier_choices = jnp.cumsum(sel, axis=1) - sel          # [S, k, E]
    pos = jnp.sum((earlier_tokens[:, None, :] + earlier_choices) * sel,
                  axis=2)                                    # [S, k]
    valid = pos < C

    # scatter: tok_of[e, c] = which token sits in expert e's slot c
    # (slot positions are unique per expert, so no write collides;
    # over-capacity and unused slots stay at the sentinel and zero out)
    tok_of = jnp.full((E, C), S, jnp.int32)
    tok_src = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None],
                               (S, top_k))
    e_idx = jnp.where(valid, top_e, E)          # invalid -> dropped row
    c_idx = jnp.where(valid, pos, C)
    tok_of = tok_of.at[e_idx, c_idx].set(tok_src, mode="drop")
    xe = jnp.concatenate([xs, jnp.zeros((1, H), xs.dtype)], axis=0)[
        tok_of]                                              # [E, C, H]

    g = expert_linear(p.gate, xe, spec_up)                   # [E, C, I] f32
    u = expert_linear(p.up, xe, spec_up)
    if act == "silu":
        inner = jax.nn.silu(g) * u
    else:
        inner = jax.nn.gelu(g, approximate=True) * u
    y = expert_linear(p.down, inner.astype(x.dtype), spec_down)  # [E, C, H]

    # gather each (token, choice)'s result back and weight it
    y_sk = y[jnp.where(valid, top_e, 0), jnp.where(valid, pos, 0)]  # [S,k,H]
    w_sk = jnp.where(valid, top_w, 0.0)[..., None]
    out = jnp.sum(w_sk * y_sk, axis=1)                       # [S, H] f32

    if p.shared_up is not None:
        from mixq_tpu.ops.mixed_linear import (
            mixed_linear, mixed_linear_prepared, prepare_act,
        )

        # gate/up share ONE quantized activation (the same invariant as
        # the dense gated MLP — q/k/v and up/gate never re-quantize)
        if spec_up.version in ("FP16", "WEIGHT_ONLY", "QUIK"):
            sg = mixed_linear(p.shared_gate, x, spec_up).astype(jnp.float32)
            su = mixed_linear(p.shared_up, x, spec_up).astype(jnp.float32)
        else:
            qact = prepare_act(x, p.shared_up, spec_up)
            sg = mixed_linear_prepared(p.shared_gate, qact,
                                       spec_up).astype(jnp.float32)
            su = mixed_linear_prepared(p.shared_up, qact,
                                       spec_up).astype(jnp.float32)
        inner_sh = (jax.nn.silu(sg) if act == "silu"
                    else jax.nn.gelu(sg, approximate=True)) * su
        sh = mixed_linear(p.shared_down, inner_sh.astype(x.dtype),
                          spec_down).astype(jnp.float32)
        route = jax.nn.sigmoid(
            xs.astype(jnp.float32) @ p.shared_route.astype(jnp.float32))
        out = out + (route * sh.reshape(S, H))
    return out.reshape(B, T, H).astype(x.dtype)
