"""Pipeline parallelism: GPipe-style microbatched inference over a mesh axis.

The reference has no pipeline runtime (its multi-GPU story is `device_map`
weight placement — SURVEY §2.8); ICI tensor parallelism + data parallelism
remain this framework's first-choice scaling strategy for <=70B serving
(PARITY.md §Parallelism records the trade). This module exists for the
capacity regime those don't reach: models whose weights exceed one
TP-reachable ICI domain, where stages must live on different hosts and
activations — not weight shards — cross the slow links.

TPU-native shape (one compiled program, no host scheduling):

  * layers are split into `n_stages` contiguous stages; each stage's
    layers are STACKED ([n_stages, L/ns, ...] leaves) and sharded over
    the mesh axis, so every device holds exactly its stage's weights —
    jax.sharding places them, no manual transfers;
  * the batch is split into M microbatches; inside one `shard_map`, the
    pipeline runs M + ns - 1 ticks: stage s processes microbatch t - s
    at tick t and hands its activation to stage s+1 via `ppermute`
    (point-to-point ICI/DCN neighbor traffic — the PP win over TP's
    all-reduces on slow links);
  * bubble ticks (t - s outside [0, M)) compute garbage on purpose —
    static shapes, no lax.cond — and their KV writes land in a SINK
    microbatch slot appended to the cache's batch dim (a conditional
    cache write would copy the multi-GB buffer: PROFILE_r02's
    lax.cond-aliasing lesson). Utilization is M / (M + ns - 1).

Scope (documented, asserted): uniform-spec dense blocks (the scan-path
requirement), batch-major bf16 KV cache, fresh prefill + in-place decode.
Sliding windows / ALiBi / quantized KV / MoE stay on the TP engine.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def stage_params(params, n_stages: int):
    """Re-stack DecoderParams for `n_stages` pipeline stages.

    Returns params with `stacked` leaves reshaped [L, ...] ->
    [n_stages, L/ns, ...]; place the result with `shard_stage_params`
    so leaf dim 0 lands on the pipe axis (each device then holds one
    stage's layers and nothing else).
    """
    from mixq_tpu.models.decoder import stack_decoder_params

    st = params if params.stacked is not None else stack_decoder_params(
        params)

    def split(a):
        L = a.shape[0]
        assert L % n_stages == 0, (
            f"layers ({L}) must divide evenly into {n_stages} stages")
        return a.reshape(n_stages, L // n_stages, *a.shape[1:])

    return st._replace(stacked=jax.tree.map(split, st.stacked))


def shard_stage_params(params, mesh: Mesh, axis: str = "pipe"):
    """Place stage-stacked params: blocks by stage over `axis`, the
    embedding/head/final-norm replicated (they run outside the staged
    region)."""
    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    stacked = jax.tree.map(lambda a: put(a, P(axis)), params.stacked)
    rep = params._replace(stacked=None)
    rep = jax.tree.map(lambda a: put(a, P()), rep)
    return rep._replace(stacked=stacked)


@functools.partial(
    jax.jit,
    static_argnames=("specs", "cfg", "mesh", "axis", "microbatches"))
def pipeline_forward(
    params,                      # DecoderParams, stage-stacked (stage_params)
    tokens: jax.Array,           # [B, T] int32
    cache,                       # KVCache, batch-major bf16, [L, B, S, h, d]
    specs,                       # DecoderSpecs (uniform)
    cfg,                         # ModelConfig
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    slot_lengths=None,           # [B] — per-row positions (continuous
                                 # batching): KV writes scatter per row
                                 # and cache.length is ignored (the
                                 # decoder.forward slot-mode contract;
                                 # gives PP a serving story — r5 item 7)
) -> Tuple[jax.Array, object]:
    """Pipelined decoder forward: same (logits, cache) contract as
    models.decoder.forward for the supported scope (fresh prefill chunk,
    uniform T>=1 continuation, or slot-mode decode on a batch-major
    bf16/int8-KV cache).

    Differentially tested against the single-device forward
    (tests/test_pipeline.py) on the virtual mesh.
    """
    from mixq_tpu.models.decoder import _norm, block_core
    from mixq_tpu.models.layers import attend, rope_cos_sin

    assert params.stacked is not None, "pipeline needs stage_params()"
    ns = mesh.shape[axis]
    if cache.head_major or cache.k_tail is not None:
        raise NotImplementedError(
            "pipeline_forward serves the batch-major cache (bf16 or int8 "
            "KV); head-major/tail caches stay on the TP engine")
    quantized = cache.quantized
    if cfg.sliding_window is not None or cfg.alibi:
        raise NotImplementedError(
            "sliding-window/ALiBi models stay on the TP engine")
    B, T = tokens.shape
    M = microbatches or ns
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    b = B // M
    L, _, S = cache.k.shape[:3]
    lps = L // ns
    H = cfg.hidden_size

    # ---- replicated preamble (same math as forward's, minimal scope) ----
    x = jnp.take(params.embed, tokens, axis=0).astype(
        jnp.dtype(specs.wqkv.out_dtype))
    if cfg.embed_multiplier != 1.0:
        x = x * jnp.asarray(cfg.embed_multiplier, x.dtype)
    slot_mode = slot_lengths is not None
    if slot_mode:
        q_slot = (slot_lengths[:, None]
                  + jnp.arange(T, dtype=jnp.int32)[None])     # [B, T]
        kv_len = slot_lengths + T                             # [B]
    else:
        q_slot = cache.length + jnp.arange(T, dtype=jnp.int32)
        kv_len = cache.length + T
    rot = cfg.rotary_dim or cfg.head_dim_
    cos, sin = rope_cos_sin(q_slot, rot, cfg.rope_theta)
    x_mb = x.reshape(M, b, T, H)

    # sink microbatch slot: bubble-tick KV writes land at batch offset
    # M*b and are sliced off afterwards
    def pad_sink(a):
        return jnp.pad(a, ((0, 0), (0, b)) + ((0, 0),) * (a.ndim - 2))

    k_pad, v_pad = pad_sink(cache.k), pad_sink(cache.v)
    write_pos = cache.length

    if slot_mode:
        # per-microbatch views of the per-row state; each stage picks its
        # current microbatch's slice per tick
        qsl_in = q_slot.reshape(M, b, T)
        kvl_in = kv_len.reshape(M, b)
        cos_in = cos.reshape(M, b, *cos.shape[1:])
        sin_in = sin.reshape(M, b, *sin.shape[1:])
    else:
        qsl_in, kvl_in, cos_in, sin_in = q_slot, kv_len, cos, sin

    def stage_fn(blocks, x_mb, cos, sin, qsl, kvl, write_pos, k_all, v_all,
                 *scale_bufs):
        # int8 KV rides two extra [L, B+b, S, n_kv] scale carriers
        ks_all, vs_all = scale_bufs if quantized else (None, None)
        # per-device views: blocks leaves [1, lps, ...], cache [lps, ...]
        s = jax.lax.axis_index(axis)
        state = jnp.zeros((b, T, H), x_mb.dtype)
        outs = jnp.zeros((M, b, T, H), x_mb.dtype)

        for t in range(M + ns - 1):          # static schedule
            mb = t - s                       # this tick's microbatch here
            valid = (mb >= 0) & (mb < M)
            mbc = jnp.clip(mb, 0, M - 1)
            off = jnp.where(valid, mbc * b, M * b)
            h = jnp.where(s == 0, x_mb[min(t, M - 1)], state)
            if slot_mode:
                # per-row state for THIS tick's microbatch (each stage is
                # on a different microbatch at a given tick)
                pick = lambda a: jax.lax.dynamic_index_in_dim(
                    a, mbc, 0, keepdims=False)
                cos_t, sin_t = pick(cos), pick(sin)
                qs_t, kl_t = pick(qsl), pick(kvl)
                rows = off + jnp.arange(b)
            else:
                cos_t, sin_t, qs_t, kl_t = cos, sin, qsl, kvl
                rows = None

            for j in range(lps):
                bp = jax.tree.map(lambda a: a[0, j], blocks)

                def kv_apply(q, k, v, j=j):
                    nonlocal k_all, v_all, ks_all, vs_all
                    if quantized:
                        from mixq_tpu.ops import quant as Q

                        k, sk = Q.quantize_kv(k)
                        v, sv = Q.quantize_kv(v)
                    if slot_mode:
                        # per-row scatter at each row's own position;
                        # bubble ticks land in the sink rows (off = M*b)
                        pos = qs_t                      # [b, T]
                        kv_at = lambda buf, val: buf.at[
                            j, rows[:, None], pos].set(
                            val.astype(buf.dtype), mode="drop")
                        k_all = kv_at(k_all, k)
                        v_all = kv_at(v_all, v)
                        if quantized:
                            ks_all = kv_at(ks_all, sk)
                            vs_all = kv_at(vs_all, sv)
                    else:
                        if quantized:
                            ks_all = jax.lax.dynamic_update_slice(
                                ks_all, sk[None].astype(ks_all.dtype),
                                (j, off, write_pos, 0))
                            vs_all = jax.lax.dynamic_update_slice(
                                vs_all, sv[None].astype(vs_all.dtype),
                                (j, off, write_pos, 0))
                        k_all = jax.lax.dynamic_update_slice(
                            k_all, k[None].astype(k_all.dtype),
                            (j, off, write_pos, 0, 0))
                        v_all = jax.lax.dynamic_update_slice(
                            v_all, v[None].astype(v_all.dtype),
                            (j, off, write_pos, 0, 0))
                    k_c = jax.lax.dynamic_slice(
                        k_all, (j, off, 0, 0, 0),
                        (1, b, S) + k_all.shape[3:])[0]
                    v_c = jax.lax.dynamic_slice(
                        v_all, (j, off, 0, 0, 0),
                        (1, b, S) + v_all.shape[3:])[0]
                    if quantized:
                        ks_c = jax.lax.dynamic_slice(
                            ks_all, (j, off, 0, 0),
                            (1, b, S, ks_all.shape[3]))[0]
                        vs_c = jax.lax.dynamic_slice(
                            vs_all, (j, off, 0, 0),
                            (1, b, S, vs_all.shape[3]))[0]
                        return attend(q, k_c, v_c, qs_t, kl_t,
                                      k_scale=ks_c, v_scale=vs_c)
                    return attend(q, k_c.astype(q.dtype),
                                  v_c.astype(q.dtype), qs_t, kl_t)

                h, _ = block_core(h, bp, kv_apply, cos_t, sin_t, specs,
                                  cfg)

            upd = outs.at[jnp.clip(mb, 0, M - 1)].set(h.astype(outs.dtype))
            outs = jnp.where(valid & (s == ns - 1), upd, outs)
            state = jax.lax.ppermute(
                h, axis, [(i, (i + 1) % ns) for i in range(ns)])

        # only the last stage holds real outputs; replicate them
        outs = jax.lax.psum(
            jnp.where(s == ns - 1, outs, jnp.zeros_like(outs)), axis)
        if quantized:
            return outs, k_all, v_all, ks_all, vs_all
        return outs, k_all, v_all

    args = [params.stacked, x_mb, cos_in, sin_in, qsl_in, kvl_in,
            write_pos, k_pad, v_pad]
    in_specs = [P(axis), P(), P(), P(), P(), P(), P(), P(axis), P(axis)]
    out_specs = [P(), P(axis), P(axis)]
    if quantized:
        args += [pad_sink(cache.k_scale), pad_sink(cache.v_scale)]
        in_specs += [P(axis), P(axis)]
        out_specs += [P(axis), P(axis)]
    res = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=tuple(in_specs), out_specs=tuple(out_specs),
    )(*args)
    if quantized:
        outs, k_new, v_new, ks_new, vs_new = res
        cache = cache._replace(k_scale=ks_new[:, :B], v_scale=vs_new[:, :B])
    else:
        outs, k_new, v_new = res

    cache = cache._replace(k=k_new[:, :B], v=v_new[:, :B])
    if not slot_mode:
        cache = cache.advance(T)
    x = _norm(outs.reshape(B, T, H), params.lnf_scale, params.lnf_bias, cfg)
    head = params.lm_head if params.lm_head is not None else params.embed.T
    hdt = jnp.dtype(specs.wqkv.out_dtype)
    logits = jnp.dot(x.astype(hdt), head.astype(hdt),
                     preferred_element_type=jnp.float32).astype(jnp.float32)
    return logits, cache
