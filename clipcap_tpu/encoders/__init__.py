from clipcap_tpu.config import EncoderConfig
from clipcap_tpu.encoders.base import (
    get_encoder,
    get_encoder_from_config,
    get_encoder_from_model,
)

__all__ = [
    "EncoderConfig",
    "get_encoder",
    "get_encoder_from_config",
    "get_encoder_from_model",
]
