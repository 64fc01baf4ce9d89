"""Encoder registry: name → (encoder, transform) dispatch.

Interface parity with /root/reference/clipcap/encoders/base.py:10-39:
``get_encoder(name, variant, …) -> (model, transform)``, plus the
config/model round-trips.  The returned ``model`` is callable on a batch of
transformed samples and returns embeddings (numpy on host); ``transform``
maps a file path / BytesIO to a single sample array.

The ``device`` argument is kept for signature parity; placement is handled
by jax (the encoder's jitted forward runs on the default device/mesh).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

from clipcap_tpu.config import EncoderConfig


def get_encoder(
    encoder_model_name: str,
    encoder_model_variant: str,
    normalize_embeddings: bool = False,
    window_size: Optional[int] = None,
    use_windowed_embeddings: bool = False,
    window_overlap_percentage: float = 0.0,
    device: str = "tpu",
    checkpoint_path: Optional[str] = None,
    int8: bool = False,
) -> Tuple[Callable, Callable]:
    kwargs = {
        "normalize_embeddings": normalize_embeddings,
        "checkpoint_path": checkpoint_path,
    }
    if encoder_model_name == "clip":
        from clipcap_tpu.encoders.clip import get_clip_encoder

        return get_clip_encoder(
            encoder_model_variant,
            use_windowed_embeddings=use_windowed_embeddings,
            window_size=window_size,
            window_overlap_percentage=window_overlap_percentage,
            int8=int8,
            **kwargs,
        )
    elif encoder_model_name == "clap":
        if int8:
            raise ValueError(
                "--int8-encoder is CLIP-only (HTSAT's head_dim-24 Swin "
                "blocks don't take the w8a8 path)")
        from clipcap_tpu.encoders.clap import get_clap_encoder

        return get_clap_encoder(encoder_model_variant, **kwargs)
    else:
        raise ValueError(f"invalid encoder name: '{encoder_model_name}'")


def get_encoder_from_config(config: EncoderConfig, device: str = "tpu",
                            checkpoint_path: Optional[str] = None,
                            int8: bool = False):
    variant = config.encoder_model_variant
    if config.encoder_model_name == "clip":
        # CLI variant un-mangling "_" → "/" (reference base.py:29-30).
        variant = variant.replace("_", "/")
    return get_encoder(
        config.encoder_model_name,
        variant,
        normalize_embeddings=config.normalize_embeddings,
        use_windowed_embeddings=config.use_windowed_embeddings,
        window_size=config.window_size,
        window_overlap_percentage=config.window_overlap_percentage,
        device=device,
        checkpoint_path=checkpoint_path,
        int8=int8,
    )


def get_encoder_from_model(model, device: str = "tpu"):
    """Rebuild the encoder a ClipCapModel was trained against
    (reference base.py:38-39)."""
    return get_encoder_from_config(model.config.encoder_config, device=device)
