"""Ring attention: sequence-parallel causal attention over a mesh axis.

SURVEY.md §5 long-context item (the reference has nothing — no ring, no
blockwise, no Ulysses). The sequence dim is sharded over a mesh axis; each
device holds one Q block and one KV block, computes its partial attention,
and the KV blocks rotate around the ring (jax.lax.ppermute over ICI) while
an online-softmax accumulator merges partials — full causal attention over
sequences P times longer than a device could hold, with compute and memory
balanced across the ring.

Capabilities:
  - GQA: query heads grouped against shared KV heads (no repeat_kv
    materialization, same einsum grouping as models/layers.py attend()).
  - TP x SP: pass `head_axis` to also shard the head dim over a second mesh
    axis — the ring rotates KV over `seq_axis` while each device only holds
    its TP slice of the heads.
  - Left-padded prompts: `kv_start` [B] masks slots before each row's first
    real token (parity with attend()'s kv_start).
  - bf16 operand compute with fp32 accumulation/softmax on TPU (fp32
    operands on CPU, where XLA lacks bf16 dot thunks — same policy as
    attend(), models/layers.py).

Engine integration: InferenceEngine routes fresh-cache prefills with
T >= EngineConfig.ring_prefill_min_t through this path (sequence sharded
over the 'data' axis = context parallelism during prefill, while decode
keeps batch on 'data').
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _op_dtype():
    # CPU XLA lacks bf16 x bf16 -> f32 dot thunks; TPU wants bf16 operands
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _block_attn(q, k, v, q_off, kv_off, scale, kv_start):
    """Partial (un-normalized) attention of a Q block vs one KV block with
    causal masking by global positions. GQA: q [B,Tq,Hq,D], k/v [B,Tk,Hkv,D],
    Hq = Hkv * groups. Returns (m [B,Tq,Hq], l [B,Tq,Hq], o [B,Tq,Hq,D],
    any_valid [B,Tq,Hq])."""
    B, Tq, Hq, D = q.shape
    Tk, Hkv = k.shape[1], k.shape[2]
    groups = Hq // Hkv
    od = _op_dtype()
    qf = q.reshape(B, Tq, Hkv, groups, D)
    s = jnp.einsum("bthgd,bshd->bhgts", qf.astype(od), k.astype(od),
                   preferred_element_type=jnp.float32) * scale
    q_pos = q_off + jnp.arange(Tq)
    k_pos = kv_off + jnp.arange(Tk)
    mask = k_pos[None, :] <= q_pos[:, None]                # [Tq,Tk] causal
    mask = jnp.broadcast_to(mask[None], (B, Tq, Tk))
    if kv_start is not None:
        mask = mask & (k_pos[None, None, :] >= kv_start[:, None, None])
    m5 = mask[:, None, None]                               # [B,1,1,Tq,Tk]
    s = jnp.where(m5, s, -jnp.inf)
    m = jnp.max(s, axis=-1)                                # [B,h,g,Tq]
    any_b = jnp.isfinite(m)
    m_safe = jnp.where(any_b, m, 0.0)
    e = jnp.exp(s - m_safe[..., None])
    e = jnp.where(m5, e, 0.0)
    l = jnp.sum(e, axis=-1)                                # [B,h,g,Tq]
    o = jnp.einsum("bhgts,bshd->bthgd", e.astype(od), v.astype(od),
                   preferred_element_type=jnp.float32)     # [B,Tq,h,g,D]

    def flat(x):                                           # [B,h,g,Tq]->[B,Tq,Hq]
        return jnp.transpose(x, (0, 3, 1, 2)).reshape(B, Tq, Hq)

    return flat(m_safe), flat(l), o.reshape(B, Tq, Hq, D), flat(any_b)


def ring_attention_local(q, k, v, axis_name: str, kv_start=None):
    """Body run inside shard_map: q/k/v are the local sequence shards
    [B, T_loc, Hq|Hkv, D]; returns the local attention output shard."""
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, T, Hq, D = q.shape
    scale = 1.0 / (D ** 0.5)
    q_off = idx * T

    # derive the accumulators from q so shard_map marks them varying over
    # the ring axis (plain zeros would be unvarying constants and fail the
    # fori_loop carry type check)
    o_acc = jnp.zeros((B, T, Hq, D), jnp.float32) + 0 * q.astype(jnp.float32)
    m_acc = jnp.full((B, T, Hq), -jnp.inf, jnp.float32) \
        + 0 * q[..., 0].astype(jnp.float32)
    l_acc = jnp.zeros((B, T, Hq), jnp.float32) + 0 * q[..., 0].astype(jnp.float32)

    perm = [(j, (j + 1) % p) for j in range(p)]

    def body(i, carry):
        o_acc, m_acc, l_acc, k_cur, v_cur = carry
        src = (idx - i) % p            # owner of the KV block we now hold
        kv_off = src * k_cur.shape[1]
        m_b, l_b, o_b, any_b = _block_attn(q, k_cur, v_cur, q_off, kv_off,
                                           scale, kv_start)
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
    q: jax.Array,                # [B, T, Hq, D] global
    k: jax.Array,                # [B, T, Hkv, D]
    v: jax.Array,
    mesh: Mesh,
    seq_axis: str = "sp",
    head_axis: Optional[str] = None,   # TP axis for the head dim (TP x SP)
    kv_start: Optional[jax.Array] = None,  # [B] first real position per row
) -> jax.Array:
    """Causal self-attention with the sequence sharded over `seq_axis`
    (and optionally heads over `head_axis`)."""
    spec = P(None, seq_axis, head_axis, None)
    if kv_start is None:
        fn = jax.shard_map(
            lambda a, b, c: ring_attention_local(a, b, c, seq_axis),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )
        return fn(q, k, v)
    fn = jax.shard_map(
        lambda a, b, c, st: ring_attention_local(a, b, c, seq_axis, st),
        mesh=mesh, in_specs=(spec, spec, spec, P(None)), out_specs=spec,
    )
    return fn(q, k, v, kv_start)
