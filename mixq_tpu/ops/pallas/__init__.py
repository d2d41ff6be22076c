"""Pallas TPU kernels for the hot ops (the reference's mixlib/EETQ/quik CUDA
kernel contract, SURVEY.md §2.1, rebuilt for the MXU/VMEM model).

Each kernel has a jnp reference implementation in mixq_tpu/ops used both as
the correctness oracle (tests run kernels in interpret mode against it) and
as the fallback path; the engine picks Pallas where profiling shows a win.
"""
from mixq_tpu.ops.pallas.int8_matmul import int8_matmul_dequant
from mixq_tpu.ops.pallas.rmsnorm_quant import fused_rmsnorm_quant
from mixq_tpu.ops.pallas.w8a16 import w8a16_matmul

__all__ = [
    "int8_matmul_dequant",
    "fused_rmsnorm_quant",
    "w8a16_matmul",
]
