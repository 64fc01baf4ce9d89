"""Template/contract for third-party encoders
(the documented plugin interface, reference
/root/reference/clipcap/encoders/_baseformat.py:1-43).

Every encoder exposes two callables:

* ``transform(file) -> np.ndarray`` — host-side: map a file path / BytesIO
  to ONE fixed-shape sample array (decode + resize/resample only; keep it
  cheap and thread-safe — it runs in the reader's worker pool).
* ``model(batch) -> np.ndarray`` — device-side: map a stacked batch of
  samples to embeddings ``[B, embedding_size]`` (or ``[B, W, E]`` windowed).
  Wrap the forward in ``jax.jit`` and expose ``embedding_size``.

Register the encoder by adding a branch in
``clipcap_tpu.encoders.base.get_encoder``.
"""
from __future__ import annotations

from typing import Callable, Tuple, Union
from io import BytesIO

import numpy as np


class BaseEncoderTransform:
    """Example transform: produce a fixed-shape array from a file."""

    def __init__(self, sample_shape=(8,)):
        self.sample_shape = sample_shape

    def __call__(self, file: Union[BytesIO, str]) -> np.ndarray:
        raise NotImplementedError("decode + preprocess your modality here")


class BaseEncoderModel:
    """Example model: batched jitted forward returning embeddings."""

    embedding_size: int = 512

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        raise NotImplementedError("jit your encoder forward here")


def get_base_encoder(variant: str, normalize_embeddings: bool = False,
                     **kwargs) -> Tuple[Callable, Callable]:
    model = BaseEncoderModel()
    transform = BaseEncoderTransform()
    return model, transform
