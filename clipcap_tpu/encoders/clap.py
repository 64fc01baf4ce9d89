"""CLAP audio encoder: host-side audio transform + batched jitted forward.

Reference parity (/root/reference/clipcap/encoders/clap.py) with its shipped
bugs fixed rather than ported (SURVEY.md §"bugs"):
* ``get_clap_encoder`` raises NameError on undefined ``model_id`` /
  ``use_windowed_embeddings`` (clap.py:136,152) — fixed signature here;
* ``CLAPTransform`` mixes to mono by averaging the *frame* axis
  (clap.py:80) — here the channel axis is averaged.

Host/device split: decode + mono + resample on host threads (numpy sinc
resampler — no torchaudio), fixed 10 s crop/pad for static shapes; the
log-mel frontend and the HTSAT swin forward run as one jitted program on
device (clipcap_tpu.models.htsat).
"""
from __future__ import annotations

import io
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.models.htsat import HTSATConfig, clap_audio_embedding, load_clap
from clipcap_tpu.ops.audio import (
    CLAP_CLIP_SAMPLES,
    CLAP_SAMPLE_RATE,
    load_audio,
    resample,
    to_mono,
)


class CLAPTransform:
    """file/BytesIO → fixed-shape model input at 48 kHz.

    Plain mode: float32 waveform ``[CLAP_CLIP_SAMPLES]`` (10 s crop /
    zero-pad), so batches have static shapes; the reference returns ragged
    waveforms that break its own batched collate for mixed-length datasets.

    Fusion mode (``enable_fusion=True`` — fusion checkpoints): the
    laion_clap fusion input ``[4, frames, 64]`` built host-side
    (``ops/audio.build_mel_fusion``): full-mel shrink + three 10 s chunks,
    so >10 s audio contributes its whole duration instead of being
    truncated.  The int16 quantization round-trip laion_clap applies to
    raw waveforms precedes the mel here, matching
    ``get_audio_embedding_from_data`` (reference clap.py:121).
    """

    def __init__(self, sample_rate: int = CLAP_SAMPLE_RATE,
                 clip_samples: int = CLAP_CLIP_SAMPLES,
                 enable_fusion: bool = False) -> None:
        self.sample_rate = sample_rate
        self.clip_samples = clip_samples
        self.enable_fusion = enable_fusion

    def __call__(self, file: Union[io.BytesIO, str, bytes]) -> np.ndarray:
        waveform, file_rate = load_audio(file)
        waveform = to_mono(waveform)
        if file_rate != self.sample_rate:
            waveform = resample(waveform, file_rate, self.sample_rate)
        if self.enable_fusion:
            from clipcap_tpu.ops.audio import build_mel_fusion

            w = np.clip(waveform, -1.0, 1.0)
            w = np.trunc(w * 32767.0) / 32767.0
            return build_mel_fusion(w.astype(np.float32))
        out = np.zeros((self.clip_samples,), dtype=np.float32)
        n = min(len(waveform), self.clip_samples)
        out[:n] = waveform[:n]
        return out


class CLAPEncoder:
    """Batched audio-embedding forward: [B, samples] → [B, 512] numpy."""

    def __init__(self, params, config: HTSATConfig,
                 normalize_embeddings: bool = False, dtype=jnp.float32,
                 text=None):
        self.params = params
        self.config = config
        self.normalize_embeddings = normalize_embeddings
        self.embedding_size = config.embedding_dim
        self.text = text  # (text_params, RobertaConfig) — rerank tower

        @jax.jit
        def _forward(params, batch):
            if batch.ndim == 4:  # fusion input [B, 4, frames, 64]
                from clipcap_tpu.models.htsat import clap_audio_embedding_fusion

                out = clap_audio_embedding_fusion(params, config, batch, dtype=dtype)
            else:                # waveforms [B, samples]
                out = clap_audio_embedding(params, config, batch, dtype=dtype)
            if normalize_embeddings:
                out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
            return out.astype(jnp.float32)

        self._forward = _forward
        self._dtype = dtype

    def __call__(self, batch) -> np.ndarray:
        return np.asarray(jax.device_get(self._forward(self.params, jnp.asarray(batch))))

    def encode_text(self, captions) -> np.ndarray:
        """Captions → L2-normalized joint-space embeddings [N, 512]
        (laion_clap ``get_text_embedding``: RoBERTa pooler → projection)."""
        from clipcap_tpu.models.htsat import clap_text_embedding
        from clipcap_tpu.utils.roberta_tokenizer import roberta_tokenize

        text_params, roberta_cfg = self.text
        ids, mask = roberta_tokenize(captions, vocab_size=roberta_cfg.vocab_size)
        emb = clap_text_embedding(text_params, roberta_cfg, jnp.asarray(ids),
                                  jnp.asarray(mask), dtype=self._dtype)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return np.asarray(emb, dtype=np.float32)

    def similarity(self, sample, captions) -> np.ndarray:
        """Audio↔caption rerank signal: cosine similarity in the CLAP joint
        space (the working version of the reference demo's rerank,
        demo.py:47-66 — which is hard-wired to a 6-tuple forward and
        crashes)."""
        audio = self._forward(self.params, jnp.asarray(np.asarray(sample))[None])
        audio = audio / np.linalg.norm(audio, axis=-1, keepdims=True)
        text = self.encode_text(list(captions))
        return (np.asarray(audio) @ text.T)[0]


def get_clap_encoder(
    encoder_model_variant: str = "HTSAT-tiny",
    normalize_embeddings: bool = False,
    checkpoint_path: Optional[str] = None,
    dtype=jnp.float32,
    **_ignored,
) -> Tuple[Callable, Callable]:
    """Fixed version of the reference's broken loader (clap.py:133-158):
    returns ``(model, transform)``."""
    from clipcap_tpu.models.htsat import CLAP_PRESETS

    if encoder_model_variant not in CLAP_PRESETS:
        # The reference ignores --encoder-model-variant for CLAP entirely
        # (its CLI default is a CLIP variant string); map unknowns to the
        # standard audio model.
        encoder_model_variant = "HTSAT-tiny"
    params, config, text = load_clap(encoder_model_variant, checkpoint_path)
    transform = CLAPTransform(enable_fusion=config.enable_fusion)
    model = CLAPEncoder(params, config,
                        normalize_embeddings=normalize_embeddings, dtype=dtype,
                        text=text)
    return model, transform
