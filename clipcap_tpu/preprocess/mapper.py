"""Mapper: batched encoder forward (reference
/root/reference/clipcap/preprocess/mapper.py:7-24).

The encoder is already a jitted device function returning numpy (see
clipcap_tpu.encoders.clip.CLIPEncoder); there is no ``.to(device)`` /
``.cpu()`` shuffling — ``jax.device_put`` happens inside the jit boundary
and only the final embeddings come back to host.
"""
from __future__ import annotations


class EncoderMapper:
    """Transforms media batches into embeddings."""

    def __init__(self, model, device: str = "tpu"):
        self.model = model
        self.device = device

    def __call__(self, item: dict) -> dict:
        return {
            "embeddings": self.model(item["data_tensor"]),
            "text": item["text"],
        }
