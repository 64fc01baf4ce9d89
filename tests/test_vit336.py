"""ViT-L/14@336px coverage (VERDICT r4 #7).

The preset has been in the catalog since round 2 — the reference serves it
through ``clip.load`` (/root/reference/clipcap/encoders/clip.py:136) and it
is the only OpenAI ViT whose grid is not 224px — but nothing exercised it.
Pin its transform geometry (336px center-crop) and the 577-token forward
(24x24 patches + cls), the longest row count any CLIP ViT feeds the
attention kernel.
"""
import dataclasses
import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jpeg(w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    buf.seek(0)
    return buf


def test_vit_l14_336_preset_and_transform():
    """Catalog entry + CLI name round-trip + the 336px transform contract
    (reference clip.py:132-153: n_px follows the variant's input
    resolution)."""
    from clipcap_tpu.encoders.clip import CLIPTransform
    from clipcap_tpu.models.clip_vit import get_clip_config

    cfg = get_clip_config("ViT-L/14@336px")
    v = cfg.vision
    assert (v.image_size, v.patch_size) == (336, 14)
    assert v.grid == 24 and v.n_patches == 576          # 577 tokens with cls
    assert (v.width, v.layers, v.heads) == (1024, 24, 16)
    assert v.embed_dim == 768 and cfg.text.embed_dim == 768
    # the CLI's "_"->"/" un-mangling (reference encoders/base.py:29-30)
    assert get_clip_config("ViT-L_14@336px").name == "ViT-L/14@336px"

    t = CLIPTransform(n_px=336)
    out = t(_jpeg(500, 400))
    assert out.shape == (336, 336, 3) and out.dtype == np.uint8
    # windowed tiling at 336px: global + 2x2 tiles, every frame 336px
    tw = CLIPTransform(n_px=336, use_windowed_embeddings=True, window_size=4)
    wout = tw(_jpeg(500, 400))
    assert wout.shape == (5, 336, 336, 3) and wout.dtype == np.uint8


@pytest.mark.slow
def test_vit_l14_336_forward_577_tokens():
    """Forward through the production encode path with the preset's true
    geometry (577-token rows, width 1024) at reduced depth — the full
    24-layer throughput run lives in benchmarks/bench_clip.py on the real
    chip."""
    import jax.numpy as jnp

    from clipcap_tpu.models.clip_vit import (clip_encode_image,
                                             get_clip_config,
                                             init_clip_vision)

    cfg = get_clip_config("ViT-L/14@336px")
    vision = dataclasses.replace(cfg.vision, layers=2)
    params = init_clip_vision(vision, seed=0)
    assert params["positional_embedding"].shape == (577, 1024)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(2, 336, 336, 3), dtype=np.uint8)
    emb = clip_encode_image(params, vision, jnp.asarray(images),
                            dtype=jnp.float32)
    emb = np.asarray(emb)
    assert emb.shape == (2, 768)
    assert np.all(np.isfinite(emb))
    # rows differ (the 577-token geometry actually flowed through)
    assert not np.allclose(emb[0], emb[1])
