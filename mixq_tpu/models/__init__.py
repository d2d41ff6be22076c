from mixq_tpu.models.decoder import (
    AttnParams,
    BlockParams,
    DecoderParams,
    DecoderSpecs,
    MLPParams,
    forward,
    init_decoder_params,
)
from mixq_tpu.models.layers import KVCache

__all__ = [
    "AttnParams",
    "BlockParams",
    "DecoderParams",
    "DecoderSpecs",
    "MLPParams",
    "forward",
    "init_decoder_params",
    "KVCache",
]
