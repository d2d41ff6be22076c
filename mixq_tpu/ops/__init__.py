from mixq_tpu.ops import quant
from mixq_tpu.ops.mixed_linear import (
    LinearSpec,
    MixLinearParams,
    QuantizedAct,
    from_float,
    mixed_linear,
    mixed_linear_prepared,
    prepare_act,
)

__all__ = [
    "quant",
    "LinearSpec",
    "MixLinearParams",
    "QuantizedAct",
    "from_float",
    "mixed_linear",
    "mixed_linear_prepared",
    "prepare_act",
]
