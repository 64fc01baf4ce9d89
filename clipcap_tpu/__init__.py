"""clipcap_tpu — a TPU-native (JAX/XLA/Pallas) captioning-pipeline framework.

Programmatic API parity with the reference package
(/root/reference/clipcap/__init__.py:1-2 exports ``load`` and
``get_encoder_from_model``; docs/inference.md:14-34 shows the intended use):

    import clipcap_tpu as clipcap
    model, tokenizer = clipcap.load("model.npz", "config.yaml")
    encoder, transform = clipcap.get_encoder_from_model(model)
    embedding = encoder(transform("image.jpg")[None])
    prefix = model.transformer_mapper(embedding)
    captions = clipcap.generate_beam(model, tokenizer, prefix)

Imports are lazy so ``import clipcap_tpu`` stays cheap (no jax compile at
import time).
"""
from __future__ import annotations

__version__ = "0.1.0"

__all__ = [
    "load",
    "get_encoder_from_model",
    "get_encoder",
    "get_encoder_from_config",
    "generate",
    "generate_beam",
    "generate_no_beam",
    "generate_nucleus_sampling",
]


def __getattr__(name):
    if name == "load":
        from clipcap_tpu.models.clipcap import load

        return load
    if name in ("get_encoder", "get_encoder_from_config", "get_encoder_from_model"):
        from clipcap_tpu.encoders import base

        return getattr(base, name)
    if name in ("generate", "generate_beam", "generate_no_beam",
                "generate_nucleus_sampling"):
        from clipcap_tpu.inference import generate as gen_mod

        return getattr(gen_mod, name)
    raise AttributeError(f"module 'clipcap_tpu' has no attribute '{name}'")
