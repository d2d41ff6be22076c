from mixq_tpu.quantize.calibration import (
    collect_act_scales,
    load_act_scales,
    outlier_sets_from_scales,
    save_act_scales,
    sigma_outlier_sets_from_scales,
)
from mixq_tpu.quantize.checkpoint import load_checkpoint, save_checkpoint
from mixq_tpu.quantize.quantizer import (
    empty_outlier_sets,
    quantize_model,
    resolve_specs,
)

__all__ = [
    "collect_act_scales",
    "load_act_scales",
    "save_act_scales",
    "outlier_sets_from_scales",
    "sigma_outlier_sets_from_scales",
    "load_checkpoint",
    "save_checkpoint",
    "empty_outlier_sets",
    "quantize_model",
    "resolve_specs",
]
