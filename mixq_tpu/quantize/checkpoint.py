"""Quantized-checkpoint persistence: safetensors shards + JSON configs.

Two-artifact model matching the reference's save_quantized
(models/base.py:78-119: HF-sharded weights + quant_config.json) and
from_quantized (base.py:161-229), in a TPU-friendly layout:

  <dir>/model-0000N.safetensors   flat param leaves (bf16 stored as uint16)
  <dir>/manifest.json             leaf paths -> (shard, logical dtype)
  <dir>/quant_config.json         QuantConfig
  <dir>/model_config.json         ModelConfig

Loading rebuilds the DecoderParams pytree by path; arrays are mmap-read per
tensor, so a host only materializes what it loads (sharded loading streams
leaf-by-leaf and can device_put each leaf onto its mesh sharding).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.config import ModelConfig, QuantConfig
from mixq_tpu.models.decoder import (
    AttnParams, BlockParams, DecoderParams, MLPParams,
)
from mixq_tpu.ops.mixed_linear import MixLinearParams

_SHARD_BYTES = 8 * 1024 ** 3        # 8GB shards (reference uses 10GB,
                                    # base.py:98 shard_checkpoint)

_BF16_TAG = "bfloat16"


def _leaf_paths(params: DecoderParams) -> List[Tuple[str, jax.Array]]:
    """Flatten to (dotted-path, leaf) with stable, readable names."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for kp, leaf in flat:
        parts = []
        for entry in kp:
            if hasattr(entry, "name"):
                parts.append(entry.name)
            elif hasattr(entry, "idx"):
                parts.append(str(entry.idx))
            elif hasattr(entry, "key"):
                parts.append(str(entry.key))
            else:
                parts.append(str(entry))
        out.append((".".join(parts), leaf))
    return out


def save_checkpoint(
    path: str,
    params: DecoderParams,
    model_cfg: ModelConfig,
    quant_cfg: QuantConfig,
) -> None:
    from safetensors.numpy import save_file

    if params.stacked is not None:
        # scan-path params keep blocks stacked along a leading layer axis;
        # persist in the canonical per-block layout so load_checkpoint (which
        # reads 'blocks.{i}.*') round-trips (engine.warmup_online returns
        # restacked params, so this path is reachable from normal use)
        from mixq_tpu.models.decoder import unstack_decoder_params

        params = unstack_decoder_params(params)
    os.makedirs(path, exist_ok=True)
    leaves = _leaf_paths(params)

    manifest: Dict[str, Any] = {"format_version": 1, "weights": {}}
    shards: List[Dict[str, np.ndarray]] = [{}]
    shard_sizes = [0]
    for name, leaf in leaves:
        if leaf.dtype == jnp.int4:
            # store packed 2-per-byte (reference packs too, linear.py:14-23)
            arr8 = np.asarray(jax.device_get(leaf.astype(jnp.int8)))
            if arr8.shape[0] % 2 == 0:
                lo = arr8[0::2].astype(np.uint8) & 0x0F
                hi = arr8[1::2].astype(np.uint8) & 0x0F
                arr = lo | (hi << 4)
                dtype = "int4_packed"
            else:
                arr = arr8
                dtype = "int4_raw"
        else:
            arr = np.asarray(jax.device_get(leaf))
            dtype = str(arr.dtype)
            if arr.dtype == jnp.bfloat16:
                arr = arr.view(np.uint16)
                dtype = _BF16_TAG
        if shard_sizes[-1] + arr.nbytes > _SHARD_BYTES and shards[-1]:
            shards.append({})
            shard_sizes.append(0)
        shards[-1][name] = arr
        shard_sizes[-1] += arr.nbytes
        manifest["weights"][name] = {
            "shard": len(shards) - 1, "dtype": dtype,
        }

    for i, shard in enumerate(shards):
        save_file(shard, os.path.join(path, f"model-{i:05d}.safetensors"))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(path, "quant_config.json"), "w") as f:
        json.dump(quant_cfg.to_dict(), f, indent=2)
    with open(os.path.join(path, "model_config.json"), "w") as f:
        json.dump(model_cfg.to_dict(), f, indent=2)


class _CheckpointReader:
    def __init__(self, path: str):
        from safetensors import safe_open

        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.path = path
        self._handles: Dict[int, Any] = {}
        self._safe_open = safe_open

    def names(self):
        return self.manifest["weights"].keys()

    def get(self, name: str, sharding=None) -> Optional[jax.Array]:
        meta = self.manifest["weights"].get(name)
        if meta is None:
            return None
        i = meta["shard"]
        if i not in self._handles:
            self._handles[i] = self._safe_open(
                os.path.join(self.path, f"model-{i:05d}.safetensors"),
                framework="np")
        arr = self._handles[i].get_tensor(name)
        if meta["dtype"] == _BF16_TAG:
            out = jnp.asarray(arr.view(jnp.bfloat16))
        elif meta["dtype"] == "int4_packed":
            lo = (arr & 0x0F).astype(np.int8)
            hi = ((arr >> 4) & 0x0F).astype(np.int8)
            lo = np.where(lo >= 8, lo - 16, lo)
            hi = np.where(hi >= 8, hi - 16, hi)
            full = np.empty((arr.shape[0] * 2,) + arr.shape[1:], np.int8)
            full[0::2], full[1::2] = lo, hi
            out = jnp.asarray(full).astype(jnp.int4)
        elif meta["dtype"] == "int4_raw":
            out = jnp.asarray(arr).astype(jnp.int4)
        else:
            out = jnp.asarray(arr)
        if sharding is not None:
            out = jax.device_put(out, sharding)
        return out


def _load_mlp(p: str, model_cfg, get, linear):
    """Dense MLP or (num_local_experts>0) sparse-MoE leaves."""
    if model_cfg.num_local_experts > 0:
        from mixq_tpu.ops.moe import ExpertLinearParams, MoEParams

        def expert(prefix):
            return ExpertLinearParams(
                q_weight=get(prefix + ".q_weight"),
                w_scale=get(prefix + ".w_scale"))

        return MLPParams(up=None, gate=None, down=None, moe=MoEParams(
            router=get(p + ".mlp.moe.router"),
            gate=expert(p + ".mlp.moe.gate"),
            up=expert(p + ".mlp.moe.up"),
            down=expert(p + ".mlp.moe.down"),
            shared_gate=linear(p + ".mlp.moe.shared_gate", required=False),
            shared_up=linear(p + ".mlp.moe.shared_up", required=False),
            shared_down=linear(p + ".mlp.moe.shared_down", required=False),
            shared_route=get(p + ".mlp.moe.shared_route")))
    return MLPParams(
        up=linear(p + ".mlp.up"),
        gate=linear(p + ".mlp.gate", required=False),  # no-gate archs
        down=linear(p + ".mlp.down"),
    )


def load_checkpoint(
    path: str,
    shardings: Optional[Dict[str, Any]] = None,
) -> Tuple[DecoderParams, ModelConfig, QuantConfig]:
    """Rebuild the DecoderParams pytree from a checkpoint directory.

    `shardings` optionally maps leaf-path regexes to jax shardings so each
    leaf is placed directly onto the mesh as it is read (no full-host copy of
    the model — the multi-host loading story)."""
    with open(os.path.join(path, "model_config.json")) as f:
        model_cfg = ModelConfig.from_dict(json.load(f))
    with open(os.path.join(path, "quant_config.json")) as f:
        quant_cfg = QuantConfig.from_dict(json.load(f))

    reader = _CheckpointReader(path)
    patterns = ([(re.compile(p), s) for p, s in shardings.items()]
                if shardings else [])

    def get(name: str):
        sh = None
        for pat, s in patterns:
            if pat.search(name):
                sh = s
                break
        return reader.get(name, sh)

    def linear(prefix: str, required: bool = True) -> Optional[MixLinearParams]:
        q = get(prefix + ".q_weight")
        if q is None:
            if required:
                raise KeyError(
                    f"checkpoint at {path} is missing required tensor "
                    f"'{prefix}.q_weight' (available prefixes: "
                    f"{sorted(set(n.split('.')[0] for n in reader.names()))})")
            return None
        return MixLinearParams(
            q_weight=q,
            w_scale=get(prefix + ".w_scale"),
            w_outlier=get(prefix + ".w_outlier"),
            out_ind=get(prefix + ".out_ind"),
            out_mask=get(prefix + ".out_mask"),
            k_mask=get(prefix + ".k_mask"),
            out_count=get(prefix + ".out_count"),
            bias=get(prefix + ".bias"),
            reduced_w=get(prefix + ".reduced_w"),
        )

    blocks = []
    for i in range(model_cfg.num_hidden_layers):
        p = f"blocks.{i}"
        blocks.append(BlockParams(
            ln1_scale=get(p + ".ln1_scale"),
            ln1_bias=get(p + ".ln1_bias"),
            attn=AttnParams(
                wq=linear(p + ".attn.wq"),
                wk=linear(p + ".attn.wk"),
                wv=linear(p + ".attn.wv"),
                wo=linear(p + ".attn.wo"),
                q_norm=get(p + ".attn.q_norm"),
                k_norm=get(p + ".attn.k_norm"),
            ),
            ln2_scale=get(p + ".ln2_scale"),
            ln2_bias=get(p + ".ln2_bias"),
            mlp=_load_mlp(p, model_cfg, get, linear),
            post_attn_norm_scale=get(p + ".post_attn_norm_scale"),
            post_ffw_norm_scale=get(p + ".post_ffw_norm_scale"),
        ))

    embed = get("embed")
    if embed is None:
        raise KeyError(f"checkpoint at {path} is missing required 'embed'")
    params = DecoderParams(
        embed=embed,
        blocks=tuple(blocks),
        lnf_scale=get("lnf_scale"),
        lnf_bias=get("lnf_bias"),
        lm_head=get("lm_head"),
        pos_embed=get("pos_embed"),
    )
    return params, model_cfg, quant_cfg
