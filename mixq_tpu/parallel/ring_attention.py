"""Ring attention: sequence-parallel causal attention over a mesh axis.

SURVEY.md §5 long-context item (the reference has nothing — no ring, no
blockwise, no Ulysses). The sequence dim is sharded over a mesh axis; each
device holds one Q block and one KV block, computes its partial attention,
and the KV blocks rotate around the ring (jax.lax.ppermute over ICI) while
an online-softmax accumulator merges partials — full causal attention over
sequences P times longer than a device could hold, with compute and memory
balanced across the ring.

This is the long-context building block (shard_map form, composable with TP
on a second axis); the decode/prefill paths in the engine use the dense /
query-chunked attention for in-budget contexts.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attn(q, k, v, q_off, kv_off, scale):
    """Partial (un-normalized) attention of a Q block vs one KV block with
    causal masking by global positions. Returns (scores_max m [B,T,h,1],
    exp-sum l [B,T,h,1], weighted values o [B,T,h,D])."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale          # [B,h,Tq,Tk]
    q_pos = q_off + jnp.arange(Tq)
    k_pos = kv_off + jnp.arange(Tk)
    mask = k_pos[None, :] <= q_pos[:, None]                # [Tq,Tk] causal
    s = jnp.where(mask[None, None], s, -jnp.inf)
    m = jnp.max(s, axis=-1)                                # [B,h,Tq]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(s - m_safe[..., None])
    e = jnp.where(mask[None, None], e, 0.0)
    l = jnp.sum(e, axis=-1)                                # [B,h,Tq]
    o = jnp.einsum("bhts,bshd->bthd", e, v.astype(jnp.float32))
    # transpose stats to [B,Tq,h]
    return (jnp.transpose(m_safe, (0, 2, 1)),
            jnp.transpose(l, (0, 2, 1)), o,
            jnp.transpose(jnp.isfinite(m), (0, 2, 1)))


def ring_attention_local(q, k, v, axis_name: str):
    """Body run inside shard_map: q/k/v are the local sequence shards
    [B, T_loc, H, D]; returns the local attention output shard."""
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, T, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    q_off = idx * T

    # derive the accumulators from q so shard_map marks them varying over
    # the ring axis (plain zeros would be unvarying constants and fail the
    # fori_loop carry type check)
    o_acc = jnp.zeros_like(q, dtype=jnp.float32)
    m_acc = jnp.full_like(q[..., 0], -jnp.inf, dtype=jnp.float32)
    l_acc = jnp.zeros_like(q[..., 0], dtype=jnp.float32)

    perm = [(j, (j + 1) % p) for j in range(p)]

    def body(i, carry):
        o_acc, m_acc, l_acc, k_cur, v_cur = carry
        src = (idx - i) % p            # owner of the KV block we now hold
        kv_off = src * T
        m_b, l_b, o_b, any_b = _block_attn(q, k_cur, v_cur, q_off, kv_off,
                                           scale)
        # online-softmax merge of (m_acc, l_acc, o_acc) with the new block
        m_b = jnp.where(any_b, m_b, -jnp.inf)
        m_new = jnp.maximum(m_acc, m_b)
        m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        c_old = jnp.where(jnp.isfinite(m_acc),
                          jnp.exp(m_acc - m_new_safe), 0.0)
        c_new = jnp.where(any_b, jnp.exp(
            jnp.where(any_b, m_b, 0.0) - m_new_safe), 0.0)
        l_acc = l_acc * c_old + l_b * c_new
        o_acc = o_acc * c_old[..., None] + o_b * c_new[..., None]
        m_acc = m_new
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return o_acc, m_acc, l_acc, k_nxt, v_nxt

    o_acc, m_acc, l_acc, _, _ = jax.lax.fori_loop(
        0, p, body, (o_acc, m_acc, l_acc, k, v))
    out = o_acc / jnp.maximum(l_acc, 1e-20)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,                # [B, T, H, D] global
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    seq_axis: str = "sp",
) -> jax.Array:
    """Causal self-attention with the sequence sharded over `seq_axis`."""
    spec = P(None, seq_axis, None, None)
    fn = jax.shard_map(
        functools.partial(ring_attention_local, axis_name=seq_axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)
