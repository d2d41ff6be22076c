"""Profiling + roofline accounting (SURVEY.md §5: the reference has only
ad-hoc time.time() + cuda.synchronize; here: jax.profiler traces plus a
static per-step byte/FLOP model so benches can report % of roofline).
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict

import jax

from mixq_tpu.config import ModelConfig


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Chip specs for roofline math (per chip).
CHIP_SPECS = {
    "v5e": {"hbm_gbps": 819.0, "bf16_tflops": 197.0, "int8_tops": 394.0},
    "v5p": {"hbm_gbps": 2765.0, "bf16_tflops": 459.0, "int8_tops": 918.0},
    "v4": {"hbm_gbps": 1228.0, "bf16_tflops": 275.0, "int8_tops": 275.0},
}


@dataclasses.dataclass
class DecodeCost:
    """Static per-decode-step cost model for a quantized decoder."""

    weight_bytes: int
    kv_bytes_per_step: int
    act_bytes: int
    flops: int

    @property
    def total_bytes(self) -> int:
        return self.weight_bytes + self.kv_bytes_per_step + self.act_bytes

    def roofline_ms(self, chip: str = "v5e") -> float:
        spec = CHIP_SPECS[chip]
        t_mem = self.total_bytes / (spec["hbm_gbps"] * 1e9)
        t_cmp = self.flops / (spec["int8_tops"] * 1e12)
        return max(t_mem, t_cmp) * 1e3

    def report(self, measured_ms: float, chip: str = "v5e") -> Dict:
        ideal = self.roofline_ms(chip)
        return {
            "chip": chip,
            "bytes_per_step_gb": round(self.total_bytes / 1e9, 2),
            "roofline_ms": round(ideal, 2),
            "measured_ms": round(measured_ms, 2),
            "roofline_fraction": round(ideal / measured_ms, 3),
        }


def decode_step_cost(
    cfg: ModelConfig,
    batch: int,
    kv_len: int,
    w_bits: int = 8,
    kv_bytes: int = 1,          # 1 = int8 KV, 2 = bf16
) -> DecodeCost:
    """Bytes/FLOPs one decode step must move/do for a dense decoder."""
    H, I = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_hidden_layers
    n_q, n_kv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim_)
    V = cfg.vocab_size

    per_layer_params = (
        H * (n_q + 2 * n_kv) * hd      # qkv
        + n_q * hd * H                  # o
        + 2 * H * I + I * H             # up, gate, down
    )
    n_params = L * per_layer_params
    weight_bytes = n_params * w_bits // 8 + 2 * V * H * 2  # + embed & head bf16

    kv_bytes_step = L * batch * kv_len * n_kv * hd * 2 * kv_bytes
    act_bytes = batch * H * L * 8 * 2   # rough: residual streams per layer
    flops = 2 * batch * (n_params + V * H) + 4 * batch * kv_len * L * n_q * hd
    return DecodeCost(weight_bytes, kv_bytes_step, act_bytes, flops)


class MetricsWriter:
    """Structured JSONL metrics sink (tokens/s, ppl, outlier counts...)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, metric: str, value, **tags):
        row = {"ts": time.time(), "metric": metric, "value": value, **tags}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        return row
