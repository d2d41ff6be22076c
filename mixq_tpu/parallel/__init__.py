from mixq_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    initialize_distributed,
    make_mesh,
    multihost_mesh,
)
from mixq_tpu.parallel.pipeline import (
    pipeline_forward,
    shard_stage_params,
    stage_params,
)
from mixq_tpu.parallel.ring_attention import ring_attention
from mixq_tpu.parallel.sharding import (
    decoder_pspecs,
    kv_cache_pspecs,
    shard_decoder_params,
    shard_kv_cache,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "multihost_mesh",
    "initialize_distributed",
    "pipeline_forward",
    "stage_params",
    "shard_stage_params",
    "ring_attention",
    "decoder_pspecs",
    "kv_cache_pspecs",
    "shard_decoder_params",
    "shard_kv_cache",
]
