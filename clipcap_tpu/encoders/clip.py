"""CLIP image encoder: host-side transform + batched jitted TPU forward.

Reference parity (/root/reference/clipcap/encoders/clip.py):
* ``CLIPTransform`` (clip.py:9-103): decode → (windowed: correct center
  crop → resize-to-tileable → tile with optional overlap →) resize/crop to
  the model's input resolution.  Two reference bugs are fixed, not ported
  (SURVEY.md §"bugs"): the center-crop box arithmetic
  (clip.py:38-47 crops to the wrong right/lower bound) and
  ``image.convert("rgb")`` (clip.py:73 — PIL modes are uppercase).
* ``CLIPModel`` (clip.py:105-129): flatten windowed batches, encode,
  optional L2-normalize, unflatten.

TPU-first split of work:
* host: image decode + resize/crop only (PIL, runs in reader worker
  threads) producing fixed-shape uint8 HWC arrays;
* device: everything else — uint8→float, mean/std normalize, patchify,
  ViT forward — one fused jitted program, bfloat16 on the MXU.
"""
from __future__ import annotations

import math
from functools import partial
from io import BytesIO
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.models.clip_vit import (
    CLIPConfig,
    clip_encode_image,
    get_clip_config,
    load_clip,
)


def _resize(image, size: Tuple[int, int]):
    from PIL import Image

    return image.resize(size, resample=Image.BICUBIC)


class CLIPTransform:
    """file/BytesIO → np.uint8 array [n_px, n_px, 3] (plain) or
    [window_size+1, n_px, n_px, 3] (windowed: global + tiles)."""

    def __init__(
        self,
        n_px: int,
        use_windowed_embeddings: bool = False,
        window_size: Optional[int] = 3 * 3,
        window_overlap_percentage: float = 0.0,
    ) -> None:
        if use_windowed_embeddings:
            assert math.sqrt(window_size).is_integer(), (
                "`window_size` must be a square number with CLIP, e.g. (3x3) = 9."
            )
        self.n_px = n_px
        self.use_windowed_embeddings = use_windowed_embeddings
        self.window_size = window_size
        self.window_overlap_percentage = window_overlap_percentage

    # -- reference clip.py:35-47, with the crop-box bug fixed --------------
    def center_crop(self, image):
        width, height = image.size
        if width > height:
            left = (width - height) // 2
            image = image.crop((left, 0, left + height, height))
        elif height > width:
            top = (height - width) // 2
            image = image.crop((0, top, width, top + width))
        return image

    # -- reference clip.py:49-58 -------------------------------------------
    def ensure_tileable(self, image):
        size, _ = image.size  # already square
        tiles_per_axis = int(math.sqrt(self.window_size))
        target = math.ceil(size / tiles_per_axis) * tiles_per_axis
        if target != size:
            from PIL import Image

            image = image.resize((target, target), resample=Image.BILINEAR)
        return image

    # -- reference clip.py:60-80 (unfold → per-tile views) ------------------
    def tile_image(self, image) -> np.ndarray:
        size, _ = image.size
        tiles_per_axis = int(math.sqrt(self.window_size))
        pixels_per_tile = size // tiles_per_axis
        if self.window_overlap_percentage != 0:
            step = math.floor(pixels_per_tile * (1 - self.window_overlap_percentage / 100))
        else:
            step = pixels_per_tile

        arr = np.asarray(image.convert("RGB"))  # [H, W, 3] uint8
        tiles = []
        for ty in range(tiles_per_axis):
            for tx in range(tiles_per_axis):
                y0, x0 = ty * step, tx * step
                tile = arr[y0 : y0 + pixels_per_tile, x0 : x0 + pixels_per_tile]
                tiles.append(tile)
        return np.stack(tiles)  # [window_size, p, p, 3]

    def _clip_preprocess(self, image) -> np.ndarray:
        """OpenAI preprocess: resize shorter side to n_px (bicubic), center
        crop n_px, RGB. Returns uint8 HWC; normalization happens on-device."""
        w, h = image.size
        scale = self.n_px / min(w, h)
        image = _resize(image, (max(self.n_px, int(round(w * scale))),
                                max(self.n_px, int(round(h * scale)))))
        w, h = image.size
        left = (w - self.n_px) // 2
        top = (h - self.n_px) // 2
        image = image.crop((left, top, left + self.n_px, top + self.n_px))
        return np.asarray(image.convert("RGB"), dtype=np.uint8)

    def __call__(self, file: Union[BytesIO, str, bytes]) -> np.ndarray:
        from PIL import Image

        if isinstance(file, bytes):
            file = BytesIO(file)
        image = Image.open(file)

        if self.use_windowed_embeddings:
            square = self.ensure_tileable(self.center_crop(image))
            tiles = self.tile_image(square)  # [W, p, p, 3] uint8
            # Resize each tile to model resolution (the reference resizes
            # via its truncated torchvision pipeline, clip.py:20-24).
            tile_imgs = np.stack([
                np.asarray(_resize(Image.fromarray(t), (self.n_px, self.n_px)))
                for t in tiles
            ])
            global_img = self._clip_preprocess(image)
            return np.concatenate([global_img[None], tile_imgs], axis=0)

        return self._clip_preprocess(image)


class CLIPEncoder:
    """Batched embedding forward (reference ``CLIPModel``, clip.py:105-129).

    Callable on ``[B, n_px, n_px, 3]`` uint8 batches (or
    ``[B, W+1, n_px, n_px, 3]`` windowed) → numpy embeddings ``[B, E]`` (or
    ``[B, W+1, E]``).  The flatten/encode/unflatten trick for windowed
    inputs is preserved (clip.py:112-129).
    """

    def __init__(self, params, config: CLIPConfig, normalize_embeddings: bool = False,
                 use_windowed_embeddings: bool = False, dtype=jnp.bfloat16,
                 precision=None, int8: bool = False):
        self.params = params
        self.config = config
        self.normalize_embeddings = normalize_embeddings
        self.use_windowed_embeddings = use_windowed_embeddings
        self.embedding_size = config.vision.embed_dim
        self.int8 = int8
        if int8:
            # w8a8 serving form: block projection weights as per-channel
            # int8 (quantized once here), activations per-token int8 at
            # each projection.  Embedding fidelity is measured, not free —
            # see tests/test_pallas.py::test_clip_int8_fidelity and the
            # pretrained-weights gate in tests/test_pretrained.py.
            from clipcap_tpu.models.clip_vit import is_resnet_config
            from clipcap_tpu.ops.quant import quantize_clip_visual_int8

            if is_resnet_config(config.vision):
                raise ValueError(
                    "int8 serving is CLIP-ViT-only (RN towers are conv-"
                    "bound; the w8a8 projection path does not apply)")

            self.params = {**params,
                           "visual": quantize_clip_visual_int8(params["visual"])}

        @partial(jax.jit, static_argnames=())
        def _forward(params, images):
            out = clip_encode_image(params, config.vision, images,
                                    dtype=dtype, precision=precision,
                                    int8_acts=int8)
            if normalize_embeddings:
                out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
            # On-disk dataset contract is float32 npy (bfloat16 is a compute
            # dtype; numpy can't round-trip it through .npy portably).
            return out.astype(jnp.float32)

        self._forward = _forward

    def __call__(self, batch) -> np.ndarray:
        x = jnp.asarray(batch)
        if self.use_windowed_embeddings:
            B, W = x.shape[0], x.shape[1]
            out = self._forward(self.params["visual"], x.reshape((B * W,) + x.shape[2:]))
            out = out.reshape(B, W, -1)
        else:
            out = self._forward(self.params["visual"], x)
        return np.asarray(jax.device_get(out))

    def encode_text(self, captions) -> np.ndarray:
        """Captions → L2-normalized joint-space embeddings [n, embed] —
        the batched half of the rerank (cosine against the already-computed
        image embeddings; avoids re-encoding images per sample)."""
        from clipcap_tpu.models.clip_vit import clip_encode_text
        from clipcap_tpu.utils.clip_tokenizer import tokenize

        tokens = jnp.asarray(tokenize(list(captions)))
        emb = clip_encode_text(self.params["text"], self.config.text, tokens,
                               dtype=jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return np.asarray(jax.device_get(emb), dtype=np.float32)

    def similarity(self, sample, captions) -> np.ndarray:
        """Image↔caption similarity logits for rerank (the demo's
        dual-encoder scoring, reference demo.py:47-66).  ``sample``:
        one transformed image [n_px, n_px, 3] (the global view is used for
        windowed inputs, mirroring eval/base.py:58-59); ``captions``: list of
        strings.  Returns [n_captions] similarities."""
        from clipcap_tpu.models.clip_vit import clip_similarity
        from clipcap_tpu.utils.clip_tokenizer import tokenize

        img = jnp.asarray(sample)
        if img.ndim == 4:  # windowed [W+1, H, W, 3] → global view
            img = img[0]
        tokens = jnp.asarray(tokenize(captions))
        # int8 encoders rerank through the same w8a8 visual path they embed
        # with — self.params already holds the quantized tree, so the flag
        # must travel with it (ADVICE r4: no silent w8/a-bf16 variant).
        logits_per_image, _ = clip_similarity(
            self.params, self.config, img[None], tokens, dtype=jnp.float32,
            int8_acts=self.int8,
        )
        return np.asarray(jax.device_get(logits_per_image))[0]


def get_clip_encoder(
    encoder_model_variant: str,
    window_size: Optional[int] = None,
    normalize_embeddings: bool = False,
    use_windowed_embeddings: bool = False,
    window_overlap_percentage: float = 0.0,
    checkpoint_path: Optional[str] = None,
    dtype=jnp.bfloat16,
    int8: bool = False,
) -> Tuple[Callable, Callable]:
    """Reference ``get_clip_encoder`` (clip.py:132-153): returns
    ``(model, transform)``."""
    params, config = load_clip(encoder_model_variant, checkpoint_path)
    transform = CLIPTransform(
        n_px=config.vision.image_size,
        use_windowed_embeddings=use_windowed_embeddings,
        window_size=window_size,
        window_overlap_percentage=window_overlap_percentage,
    )
    model = CLIPEncoder(
        params, config,
        normalize_embeddings=normalize_embeddings,
        use_windowed_embeddings=use_windowed_embeddings,
        dtype=dtype,
        int8=int8,
    )
    return model, transform
