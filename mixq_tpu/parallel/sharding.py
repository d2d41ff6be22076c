"""Sharding rules: PartitionSpecs for the quantized param pytree + KV cache.

The TP layout follows the standard Megatron-style split, expressed as GSPMD
shardings (SURVEY.md §2.8 + §7.4):
  - wqkv / up / gate : column-parallel  — weight [K, N] -> P(None, 'model')
  - wo / down        : row-parallel     — weight [K, N] -> P('model', None),
                       XLA inserts the psum after the contraction
  - per-out-channel scales/bias/outlier weights follow their weight's N axis
  - row-parallel k-side metadata (k_mask over the contraction dim) follows K
  - KV cache          : batch on 'data', kv heads on 'model'
  - activations       : batch on 'data', hidden replicated (Zero-3-style
                        activation sharding is a non-goal for inference)

Outlier bookkeeping under TP (SURVEY.md §7 "hard parts"): for column-parallel
layers the outlier channels live in the *replicated* K dim, so out_ind/k_mask
replicate and the fp outlier GEMM shards over N like the int GEMM. For
row-parallel layers K is sharded; we keep indices global + replicated and let
GSPMD partition the gather — correct everywhere, and the fp16 outlier GEMM
[M,B]x[B,N] is tiny relative to the int GEMM.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mixq_tpu.models.decoder import (
    AttnParams, BlockParams, DecoderParams, MLPParams,
)
from mixq_tpu.models.layers import KVCache
from mixq_tpu.ops.mixed_linear import MixLinearParams
from mixq_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _maybe(x, spec):
    """Spec for an optional field: None passes through (empty pytree)."""
    return None if x is None else spec


def linear_pspecs(
    p: MixLinearParams, col_parallel: bool, stacked: bool = False
) -> MixLinearParams:
    """PartitionSpec pytree for one quantized linear ([K, N] layout).
    `stacked` marks scan-path params whose leaves carry a leading layer
    axis (so a per-channel scale is rank 2, a grouped scale rank 3)."""
    m = MODEL_AXIS
    if col_parallel:
        w = P(None, m)
        n_axis = P(m)
        k_axis = P(None)
    else:
        w = P(m, None)
        n_axis = P(None)
        k_axis = P(m)
    # group-quantized weights carry w_scale [G, N]: the group axis (a slice
    # of K) must not be sharded — shard/replicate the N axis to match the
    # weight's out-channel sharding (a rank-1 spec here would shard G and
    # force GSPMD resharding collectives)
    grouped = getattr(p.w_scale, "ndim", 1) == (3 if stacked else 2)
    w_scale_spec = ((P(None, m) if col_parallel else P(None, None))
                    if grouped else n_axis)
    return MixLinearParams(
        q_weight=w,
        w_scale=w_scale_spec,
        w_outlier=_maybe(p.w_outlier, P(None, m) if col_parallel else P(None, None)),
        out_ind=_maybe(p.out_ind, P(None)),
        out_mask=_maybe(p.out_mask, P(None)),
        k_mask=_maybe(p.k_mask, k_axis),
        out_count=_maybe(p.out_count, P()),
        bias=_maybe(p.bias, n_axis),
        reduced_w=_maybe(p.reduced_w, n_axis),
    )


def _block_pspecs(bp: BlockParams, stacked: bool = False) -> BlockParams:
    return BlockParams(
        ln1_scale=P(None),
        ln1_bias=_maybe(bp.ln1_bias, P(None)),
        attn=AttnParams(
            wq=linear_pspecs(bp.attn.wq, col_parallel=True, stacked=stacked),
            wk=linear_pspecs(bp.attn.wk, col_parallel=True, stacked=stacked),
            wv=linear_pspecs(bp.attn.wv, col_parallel=True, stacked=stacked),
            wo=linear_pspecs(bp.attn.wo, col_parallel=False, stacked=stacked),
            q_norm=_maybe(bp.attn.q_norm, P(None)),   # [hd] replicated
            k_norm=_maybe(bp.attn.k_norm, P(None)),
        ),
        ln2_scale=_maybe(bp.ln2_scale, P(None)),
        ln2_bias=_maybe(bp.ln2_bias, P(None)),
        mlp=_mlp_pspecs(bp.mlp, stacked=stacked),
        post_attn_norm_scale=_maybe(bp.post_attn_norm_scale, P(None)),
        post_ffw_norm_scale=_maybe(bp.post_ffw_norm_scale, P(None)),
    )


def _mlp_pspecs(mlp: MLPParams, stacked: bool = False) -> MLPParams:
    if mlp.moe is not None:
        # EXPERT parallelism: the expert axis splits over the model axis
        # (each shard holds E/tp experts' full weights; the dispatch/
        # combine einsums shard on E and GSPMD inserts the token
        # all-gather + psum). Router is tiny — replicated.
        from mixq_tpu.ops.moe import ExpertLinearParams, MoEParams

        def ep(p: ExpertLinearParams) -> ExpertLinearParams:
            qs = P(MODEL_AXIS, None, None)
            ss = _maybe(p.w_scale, P(MODEL_AXIS, None))
            return ExpertLinearParams(q_weight=qs, w_scale=ss)

        lp = lambda p, col: (None if p is None
                             else linear_pspecs(p, col_parallel=col,
                                                stacked=stacked))
        moe = MoEParams(router=P(None, None), gate=ep(mlp.moe.gate),
                        up=ep(mlp.moe.up), down=ep(mlp.moe.down),
                        # qwen2-moe shared expert: dense TP like the
                        # regular MLP; tiny route vector replicated
                        shared_gate=lp(mlp.moe.shared_gate, True),
                        shared_up=lp(mlp.moe.shared_up, True),
                        shared_down=lp(mlp.moe.shared_down, False),
                        shared_route=_maybe(mlp.moe.shared_route,
                                            P(None, None)))
        return MLPParams(up=None, gate=None, down=None, moe=moe)
    return MLPParams(
        up=linear_pspecs(mlp.up, col_parallel=True, stacked=stacked),
        gate=(None if mlp.gate is None
              else linear_pspecs(mlp.gate, col_parallel=True,
                                 stacked=stacked)),
        down=linear_pspecs(mlp.down, col_parallel=False,
                           stacked=stacked),
    )


def decoder_pspecs(params: DecoderParams) -> DecoderParams:
    """PartitionSpec pytree mirroring a DecoderParams instance (loop or
    stacked form; stacked leaves get an unsharded leading layer axis)."""
    stacked_spec = None
    if params.stacked is not None:
        base = _block_pspecs(params.stacked, stacked=True)
        stacked_spec = jax.tree.map(
            lambda s: P(None, *s), base,
            is_leaf=lambda x: isinstance(x, P))
    blocks = [_block_pspecs(bp) for bp in params.blocks]
    return DecoderParams(
        embed=P(None, None),
        blocks=tuple(blocks),
        lnf_scale=P(None),
        lnf_bias=_maybe(params.lnf_bias, P(None)),
        lm_head=_maybe(params.lm_head, P(None, MODEL_AXIS)),
        stacked=stacked_spec,
        pos_embed=_maybe(params.pos_embed, P(None, None)),
    )


def kv_cache_pspecs(shard_heads: bool = True, quantized: bool = False,
                    head_major: bool = False, tail: bool = False) -> KVCache:
    """KV cache [L, B, S, n_kv, hd]: batch on 'data', kv heads on 'model'.
    For MQA (n_kv=1) set shard_heads=False (heads can't split; KV replicates
    on the model axis). int8-KV scale arrays [L, B, S, n_kv] follow the same
    batch/head split. head_major caches ([L, n_kv, B, S, hd], the
    flash-decode layout) shard the same logical axes, as do their
    token-major decode tails [L, R, B, n_kv, hd]."""
    head_axis = MODEL_AXIS if shard_heads else None
    if head_major:
        kv = P(None, head_axis, DATA_AXIS, None, None)
        sc = P(None, head_axis, DATA_AXIS, None) if quantized else None
    else:
        kv = P(None, DATA_AXIS, None, head_axis, None)
        sc = P(None, DATA_AXIS, None, head_axis) if quantized else None
    tail_kw = {}
    if tail:
        t_kv = P(None, None, DATA_AXIS, head_axis, None)
        # tail scales are [L, B, R, n_kv] (layers.py KVCache)
        t_sc = P(None, DATA_AXIS, None, head_axis) if quantized else None
        tail_kw = dict(k_tail=t_kv, v_tail=t_kv, kt_scale=t_sc,
                       vt_scale=t_sc, tail_base=P())
    return KVCache(k=kv, v=kv, k_scale=sc, v_scale=sc, length=P(),
                   head_major=head_major, **tail_kw)


def shard_decoder_params(
    params: DecoderParams, mesh: Mesh
) -> DecoderParams:
    """device_put the param pytree onto the mesh per the TP rules."""
    pspecs = decoder_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs,
    )


def shard_kv_cache(
    cache: KVCache, mesh: Mesh, shard_heads: Optional[bool] = None
) -> KVCache:
    if shard_heads is None:  # auto: only if kv heads divide the model axis
        n_kv = cache.k.shape[1 if cache.head_major else 3]
        tp = mesh.shape.get(MODEL_AXIS, 1)
        shard_heads = n_kv % tp == 0
    pspecs = kv_cache_pspecs(shard_heads, quantized=cache.quantized,
                             head_major=cache.head_major,
                             tail=cache.k_tail is not None)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, pspecs,
    )


def batch_pspec() -> P:
    return P(DATA_AXIS)
