"""OpenAI CLIP in pure JAX: ViT image tower + causal text tower.

Capability parity with the reference's encoder layer, which wraps the
``clip`` pip package (/root/reference/clipcap/encoders/clip.py:132-153 calls
``clip.load(variant)`` and ``model.encode_image``; the demo additionally
uses text-image similarity for rerank, inference/demo.py:47-66).

TPU-first design:
* The patch "conv" is a patchify-reshape + one matmul — identical math to
  the stride-``patch`` Conv2d, but lands directly on the MXU with no conv
  lowering, and makes the OpenAI weight import a single reshape.
* Transformer blocks are layer-stacked pytrees under ``lax.scan`` (one
  compiled block; fast compiles; clean remat boundary), as in gpt2.py.
* Normalization of pixel values is folded into the device-side forward so
  the host pipeline ships uint8 and the HBM-side math is one fused program.
* Compute dtype configurable: bfloat16 for the ≥10k embeds/sec/chip
  preprocess target, float32 + HIGHEST for parity tests.

Weight import accepts both the OpenAI checkpoint layout (``visual.…``,
``transformer.resblocks.…``) and HF ``CLIPModel`` layout.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.ops.attention import sdpa, sdpa_packed
from clipcap_tpu.ops.layers import layer_norm, linear, normal_init, ones_init, quick_gelu, zeros_init

Array = jax.Array
Params = Dict[str, Any]

NEG_INF = -1e9

# OpenAI CLIP pixel normalization (reference clip.py:23 applies the same
# constants through torchvision Normalize).
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512  # output (joint) embedding size

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.grid * self.grid


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    # ViT variants carry a CLIPVisionConfig; RN50-family variants carry a
    # clip_resnet.CLIPResNetConfig (both expose image_size/embed_dim).
    vision: Any
    text: CLIPTextConfig


def _preset(name, *, image_size, patch, vwidth, vlayers, vheads, embed,
            twidth, tlayers, theads) -> CLIPConfig:
    return CLIPConfig(
        name=name,
        vision=CLIPVisionConfig(image_size=image_size, patch_size=patch,
                                width=vwidth, layers=vlayers, heads=vheads,
                                embed_dim=embed),
        text=CLIPTextConfig(width=twidth, layers=tlayers, heads=theads,
                            embed_dim=embed),
    )


# The ViT family `clip.load` exposes (reference --encoder-model-variant).
CLIP_PRESETS: Dict[str, CLIPConfig] = {
    "ViT-B/32": _preset("ViT-B/32", image_size=224, patch=32, vwidth=768,
                        vlayers=12, vheads=12, embed=512, twidth=512,
                        tlayers=12, theads=8),
    "ViT-B/16": _preset("ViT-B/16", image_size=224, patch=16, vwidth=768,
                        vlayers=12, vheads=12, embed=512, twidth=512,
                        tlayers=12, theads=8),
    "ViT-L/14": _preset("ViT-L/14", image_size=224, patch=14, vwidth=1024,
                        vlayers=24, vheads=16, embed=768, twidth=768,
                        tlayers=12, theads=12),
    "ViT-L/14@336px": _preset("ViT-L/14@336px", image_size=336, patch=14,
                              vwidth=1024, vlayers=24, vheads=16, embed=768,
                              twidth=768, tlayers=12, theads=12),
    # Test-scale preset (not an OpenAI model): tiny towers for integration
    # tests and offline smoke runs of the CLIs.
    "test-tiny": _preset("test-tiny", image_size=32, patch=16, vwidth=64,
                         vlayers=2, vheads=4, embed=32, twidth=64, tlayers=2,
                         theads=4),
}


def _preset_rn(name, *, image_size, width, layers, embed, twidth, tlayers,
               theads) -> CLIPConfig:
    from clipcap_tpu.models.clip_resnet import CLIPResNetConfig

    return CLIPConfig(
        name=name,
        vision=CLIPResNetConfig(image_size=image_size, width=width,
                                layers=layers, heads=width * 32 // 64,
                                embed_dim=embed),
        text=CLIPTextConfig(width=twidth, layers=tlayers, heads=theads,
                            embed_dim=embed),
    )


def _rn_presets() -> Dict[str, CLIPConfig]:
    # The ModifiedResNet family `clip.load` also exposes (reference
    # clip.py:134-136 serves any `clip.available_models()` name).
    return {
        "RN50": _preset_rn("RN50", image_size=224, width=64,
                           layers=(3, 4, 6, 3), embed=1024, twidth=512,
                           tlayers=12, theads=8),
        "RN101": _preset_rn("RN101", image_size=224, width=64,
                            layers=(3, 4, 23, 3), embed=512, twidth=512,
                            tlayers=12, theads=8),
        "RN50x4": _preset_rn("RN50x4", image_size=288, width=80,
                             layers=(4, 6, 10, 6), embed=640, twidth=640,
                             tlayers=12, theads=10),
        "RN50x16": _preset_rn("RN50x16", image_size=384, width=96,
                              layers=(6, 8, 18, 8), embed=768, twidth=768,
                              tlayers=12, theads=12),
        "RN50x64": _preset_rn("RN50x64", image_size=448, width=128,
                              layers=(3, 15, 36, 10), embed=1024,
                              twidth=1024, tlayers=12, theads=16),
        # Test-scale RN preset for CPU integration tests.
        "test-tiny-rn": _preset_rn("test-tiny-rn", image_size=64, width=8,
                                   layers=(1, 1, 1, 1), embed=32, twidth=64,
                                   tlayers=2, theads=4),
    }


def is_resnet_config(vision_cfg) -> bool:
    from clipcap_tpu.models.clip_resnet import CLIPResNetConfig

    return isinstance(vision_cfg, CLIPResNetConfig)


def get_clip_config(variant: str) -> CLIPConfig:
    variant = variant.replace("_", "/")  # reference un-mangling (base.py:29-30)
    if variant in CLIP_PRESETS:
        return CLIP_PRESETS[variant]
    rn = _rn_presets()
    if variant in rn:
        return rn[variant]
    raise ValueError(
        f"unknown CLIP variant '{variant}'. "
        f"Known: {sorted(CLIP_PRESETS) + sorted(rn)}")


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_clip_vision(cfg: CLIPVisionConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    L, D = cfg.layers, cfg.width
    F = 4 * D
    patch_dim = 3 * cfg.patch_size * cfg.patch_size

    def ln(n=D):
        return {"scale": ones_init((L, n)), "bias": zeros_init((L, n))}

    return {
        "patch_embed": {"w": normal_init(rng, (patch_dim, D), std=D ** -0.5)},
        "class_embedding": normal_init(rng, (D,), std=D ** -0.5),
        "positional_embedding": normal_init(rng, (cfg.n_patches + 1, D), std=0.01),
        "ln_pre": {"scale": ones_init((D,)), "bias": zeros_init((D,))},
        "blocks": {
            "ln_1": ln(),
            "attn": {
                "in_proj": {"w": normal_init(rng, (L, D, 3 * D)), "b": zeros_init((L, 3 * D))},
                "out_proj": {"w": normal_init(rng, (L, D, D)), "b": zeros_init((L, D))},
            },
            "ln_2": ln(),
            "mlp": {
                "c_fc": {"w": normal_init(rng, (L, D, F)), "b": zeros_init((L, F))},
                "c_proj": {"w": normal_init(rng, (L, F, D)), "b": zeros_init((L, D))},
            },
        },
        "ln_post": {"scale": ones_init((D,)), "bias": zeros_init((D,))},
        "proj": normal_init(rng, (D, cfg.embed_dim), std=D ** -0.5),
    }


def init_clip_text(cfg: CLIPTextConfig, seed: int = 1) -> Params:
    rng = np.random.default_rng(seed)
    L, D = cfg.layers, cfg.width
    F = 4 * D

    def ln(n=D):
        return {"scale": ones_init((L, n)), "bias": zeros_init((L, n))}

    return {
        "token_embedding": normal_init(rng, (cfg.vocab_size, D), std=0.02),
        "positional_embedding": normal_init(rng, (cfg.context_length, D), std=0.01),
        "blocks": {
            "ln_1": ln(),
            "attn": {
                "in_proj": {"w": normal_init(rng, (L, D, 3 * D)), "b": zeros_init((L, 3 * D))},
                "out_proj": {"w": normal_init(rng, (L, D, D)), "b": zeros_init((L, D))},
            },
            "ln_2": ln(),
            "mlp": {
                "c_fc": {"w": normal_init(rng, (L, D, F)), "b": zeros_init((L, F))},
                "c_proj": {"w": normal_init(rng, (L, F, D)), "b": zeros_init((L, D))},
            },
        },
        "ln_final": {"scale": ones_init((D,)), "bias": zeros_init((D,))},
        "text_projection": normal_init(rng, (D, cfg.embed_dim), std=D ** -0.5),
    }


def init_clip(cfg: CLIPConfig, seed: int = 0) -> Params:
    if is_resnet_config(cfg.vision):
        from clipcap_tpu.models.clip_resnet import init_clip_resnet

        visual = init_clip_resnet(cfg.vision, seed)
    else:
        visual = init_clip_vision(cfg.vision, seed)
    return {
        "visual": visual,
        "text": init_clip_text(cfg.text, seed + 1),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _packed_attn_enabled() -> bool:
    """Whether unbiased tower attention routes through the packed-qkv Pallas
    kernel (``ops.attention.sdpa_packed``).  Default: on for the TPU backend
    (measured: ViT-B/32 b512 forward 55.0 → 43.9 ms on v5e — the kernel
    removes the head-major relayouts and the [B,H,N,N] logits HBM
    round-trips that cost ~2 ms/block on the XLA path), off elsewhere
    (interpret-mode Pallas would crawl on CPU).  ``CLIPCAP_FUSED_ATTN=1/0``
    forces either way — 1 is how CPU tests exercise the kernel path."""
    env = os.environ.get("CLIPCAP_FUSED_ATTN")
    if env is not None:
        return env.lower() not in ("0", "false", "no", "off", "")
    return jax.default_backend() == "tpu"


def _clip_block(x: Array, layer: Params, heads: int, eps: float, bias, precision,
                causal: bool = False, lin=linear) -> Array:
    """Pre-norm transformer block with standard (biased) MHA + QuickGELU MLP.

    ``causal`` replaces the text tower's additive NEG_INF bias (same masked
    softmax, kernel-eligible); ``bias`` remains for arbitrary additive
    biases, which take the XLA path.  ``lin`` is the projection primitive —
    ``ops.layers.linear`` (bf16 MXU) or ``ops.quant.int8_linear`` (w8a8:
    int8 MXU at ~1.4x the bf16 rate; attention math stays bf16)."""
    B, N, D = x.shape
    Dh = D // heads

    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], eps)
    qkv = lin(h, layer["attn"]["in_proj"]["w"], layer["attn"]["in_proj"]["b"], precision)
    if bias is None and _packed_attn_enabled():
        # Packed-qkv Pallas kernel: takes the in_proj output verbatim and
        # returns the out_proj input — zero layout work at the kernel
        # boundary (the earlier whole-row kernel lost exactly there; see
        # ops/attention.py for all measured verdicts).  Picks the stripe or
        # whole-row form per shape; falls back to the XLA path internally
        # when neither fits the VMEM budget.
        attn = sdpa_packed(qkv, heads, causal=causal)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, heads, Dh)
        k = k.reshape(B, N, heads, Dh)
        v = v.reshape(B, N, heads, Dh)
        attn = sdpa(q, k, v, bias=bias, causal=causal,
                    fused=False).reshape(B, N, D)
    attn = lin(attn, layer["attn"]["out_proj"]["w"], layer["attn"]["out_proj"]["b"], precision)
    x = x + attn

    h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], eps)
    h = lin(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], precision)
    h = quick_gelu(h)
    h = lin(h, layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], precision)
    return x + h


def _clip_block_cls(x: Array, layer: Params, heads: int, eps: float, precision,
                    lin=linear) -> Array:
    """The final vision block restricted to the class-token output row.

    ``clip_encode_image`` keeps only ``x[:, 0]`` after the last block, so
    every other row's attention output and MLP are dead work there — this
    computes q for the cls row alone (k/v still over all rows) and runs the
    MLP on one token.  EXACT (same ops on the surviving row; measured
    max |Δ| = 0 vs the full block on chip) and worth ~2.3 ms at ViT-B/32
    batch 512.  Returns [B, D]."""
    B, N, D = x.shape
    Dh = D // heads
    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], eps)
    qkv = lin(h, layer["attn"]["in_proj"]["w"], layer["attn"]["in_proj"]["b"], precision)
    q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
    q0 = q[:, :1]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q0, k) * (Dh ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    a = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(B, 1, D)
    x0 = x[:, :1] + lin(a, layer["attn"]["out_proj"]["w"],
                        layer["attn"]["out_proj"]["b"], precision)
    h = layer_norm(x0, layer["ln_2"]["scale"], layer["ln_2"]["bias"], eps)
    h = lin(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], precision)
    x0 = x0 + lin(quick_gelu(h), layer["mlp"]["c_proj"]["w"],
                  layer["mlp"]["c_proj"]["b"], precision)
    return x0[:, 0]


def patchify(images: Array, patch: int) -> Array:
    """[B, H, W, 3] → [B, (H/p)(W/p), p·p·3], row-major patch order matching
    Conv2d(stride=p) + flatten. Channel ordering inside a patch is (c, ph, pw)
    to match the conv kernel layout after ``w.reshape(width, -1).T``."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    # → [B, gh, gw, C, ph, pw] so flattened patch dim == conv weight layout
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, gh * gw, C * patch * patch)


def clip_encode_image(
    params: Params,
    cfg: CLIPVisionConfig,
    images: Array,  # [B, H, W, 3] float in [0,1] or uint8
    *,
    dtype=jnp.float32,
    precision=None,
    normalize_pixels: bool = True,
    int8_acts: bool = False,
) -> Array:
    """ViT forward → [B, embed_dim] joint-space embeddings
    (``model.encode_image``, reference clip.py:121).

    ``int8_acts=True`` runs the block projections as w8a8 int8 matmuls
    (``ops.quant.int8_linear``); ``params["blocks"]`` must then hold the
    ``{"q","s"}`` weights from ``ops.quant.quantize_clip_visual_int8``.
    Attention math, layer norms, patch embed, and the final projection
    stay in the compute dtype.

    RN50-family configs dispatch to the ModifiedResNet forward
    (``models/clip_resnet.py``); int8 serving is ViT-only."""
    if is_resnet_config(cfg):
        from clipcap_tpu.models.clip_resnet import clip_encode_image_resnet

        if int8_acts:
            raise ValueError("int8 serving is CLIP-ViT-only (RN towers are "
                             "conv-bound; the w8a8 projection path does not "
                             "apply)")
        return clip_encode_image_resnet(params, cfg, images, dtype=dtype,
                                        precision=precision,
                                        normalize_pixels=normalize_pixels)

    # Fold pixel normalization (and the uint8 /255) INTO the patch-embed
    # weights: ((x - mean)/std) @ W  ==  x @ (W/std) - (mean/std) @ W.
    # The fold is a pass over the 2.4M-param weight instead of the 77M-pixel
    # batch — pixel normalization then costs zero HBM traffic (the
    # "Pallas-fused preprocessing" north star, BASELINE.json, done in the
    # matmul itself).  Patch rows are (c, ph, pw)-ordered (see patchify), so
    # the per-channel constants repeat patch_size² times each.
    w = params["patch_embed"]["w"].astype(dtype)  # [p·p·3, D]
    bias0 = None
    if normalize_pixels:
        pp = cfg.patch_size * cfg.patch_size
        mean_p = jnp.repeat(jnp.asarray(IMAGE_MEAN, jnp.float32), pp)
        std_p = jnp.repeat(jnp.asarray(IMAGE_STD, jnp.float32), pp)
        scale_p = (1.0 / std_p)
        if images.dtype == jnp.uint8:
            scale_p = scale_p / 255.0  # raw 0..255 values flow into the matmul
        w = (w.astype(jnp.float32) * scale_p[:, None]).astype(dtype)
        bias0 = -(mean_p / std_p) @ params["patch_embed"]["w"].astype(jnp.float32)
        bias0 = bias0.astype(dtype)

    from clipcap_tpu.ops.patch_embed import (patch_embed_fused,
                                             patch_embed_supported,
                                             patch_kernel_enabled)

    if (patch_kernel_enabled() and dtype == jnp.bfloat16
            and patch_embed_supported(images, cfg.patch_size)):
        # One-pass uint8 im2col+matmul Pallas kernel (opt-in,
        # CLIPCAP_PATCH_KERNEL=1; measured verdict in docs/performance.md).
        # uint8 /255 is inside the fold when normalizing; without the fold
        # the raw-0..255 scale folds into the weight the same way.
        if normalize_pixels:
            wk, bk = w, bias0
        else:
            wk = (params["patch_embed"]["w"].astype(jnp.float32) / 255.0).astype(dtype)
            bk = None
        x = patch_embed_fused(images, wk, bk, cfg.patch_size, out_dtype=dtype)
    else:
        x = images.astype(dtype)
        if not normalize_pixels and images.dtype == jnp.uint8:
            x = x / 255.0
        x = patchify(x, cfg.patch_size)
        x = linear(x, w, bias0, precision)  # [B, N, D]

    B = x.shape[0]
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype)[None, None], (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)[None]
    x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])

    lin = linear
    if int8_acts:
        from clipcap_tpu.ops.quant import int8_linear

        lin = int8_linear
    block = partial(_clip_block, heads=cfg.heads, eps=1e-5, bias=None,
                    precision=precision, lin=lin)

    def scan_fn(carry, layer):
        return block(carry, layer), None

    # Run layers 0..L-2 in the scan; the final block computes only the
    # class-token row (everything else is discarded by the ``x[:, 0]``
    # below anyway — see _clip_block_cls).
    body = jax.tree_util.tree_map(lambda p: p[:-1], params["blocks"])
    last = jax.tree_util.tree_map(lambda p: p[-1], params["blocks"])
    x, _ = jax.lax.scan(scan_fn, x, body)
    x = _clip_block_cls(x, last, heads=cfg.heads, eps=1e-5, precision=precision,
                        lin=lin)

    x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"])
    return jnp.dot(x, params["proj"].astype(x.dtype), precision=precision)


def clip_encode_text(
    params: Params,
    cfg: CLIPTextConfig,
    tokens: Array,  # [B, context_length] int32, zero-padded after EOT
    *,
    dtype=jnp.float32,
    precision=None,
) -> Array:
    """Causal text transformer → [B, embed_dim] (``model.encode_text``)."""
    x = jnp.take(params["token_embedding"], tokens, axis=0).astype(dtype)
    x = x + params["positional_embedding"].astype(dtype)[None]

    # Causal masking via the flag (kernel-eligible) rather than an additive
    # NEG_INF bias — identical masked softmax (exp underflows to 0 either
    # way under the row-max shift); HF-parity tested.
    block = partial(_clip_block, heads=cfg.heads, eps=1e-5, bias=None,
                    causal=True, precision=precision)

    def scan_fn(carry, layer):
        return block(carry, layer), None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    x = layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"])

    # Features at the EOT token = argmax token id per row (OpenAI convention).
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(x, params["text_projection"].astype(x.dtype), precision=precision)


def clip_similarity(
    params: Params,
    cfg: CLIPConfig,
    images: Array,
    tokens: Array,
    *,
    dtype=jnp.float32,
    precision=None,
    int8_acts: bool = False,
) -> Tuple[Array, Array]:
    """Scaled cosine-similarity logits ``(logits_per_image, logits_per_text)``
    — the rerank signal used by the inference demo (demo.py:47-66).

    ``int8_acts`` must match how ``params["visual"]`` was prepared: a tree
    quantized by ``quantize_clip_visual_int8`` runs the full w8a8 path here
    too, so rerank sees the same numeric variant as embedding extraction
    (not a silent third weight-only-dequant variant)."""
    img = clip_encode_image(params["visual"], cfg.vision, images, dtype=dtype,
                            precision=precision, int8_acts=int8_acts)
    txt = clip_encode_text(params["text"], cfg.text, tokens, dtype=dtype, precision=precision)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"]).astype(img.dtype)
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# Weight import (OpenAI `clip` checkpoints and HF CLIPModel state dicts)
# ---------------------------------------------------------------------------


def _to_np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):
        return x.detach().cpu().float().numpy()
    return np.asarray(x)


def _text_params_from_openai(sd, txt: CLIPTextConfig) -> Params:
    """The text-tower half of an OpenAI state dict (shared by ViT and RN
    checkpoints — both carry the same causal transformer)."""

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(txt.layers):
            a = sd[fmt.format(i)]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs).astype(np.float32))

    prefix = "transformer.resblocks"
    blocks = {
        "ln_1": {"scale": stack(prefix + ".{}.ln_1.weight"),
                 "bias": stack(prefix + ".{}.ln_1.bias")},
        "attn": {
            "in_proj": {"w": stack(prefix + ".{}.attn.in_proj_weight", transpose=True),
                        "b": stack(prefix + ".{}.attn.in_proj_bias")},
            "out_proj": {"w": stack(prefix + ".{}.attn.out_proj.weight", transpose=True),
                         "b": stack(prefix + ".{}.attn.out_proj.bias")},
        },
        "ln_2": {"scale": stack(prefix + ".{}.ln_2.weight"),
                 "bias": stack(prefix + ".{}.ln_2.bias")},
        "mlp": {
            "c_fc": {"w": stack(prefix + ".{}.mlp.c_fc.weight", transpose=True),
                     "b": stack(prefix + ".{}.mlp.c_fc.bias")},
            "c_proj": {"w": stack(prefix + ".{}.mlp.c_proj.weight", transpose=True),
                       "b": stack(prefix + ".{}.mlp.c_proj.bias")},
        },
    }
    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"].astype(np.float32)),
        "positional_embedding": jnp.asarray(sd["positional_embedding"].astype(np.float32)),
        "blocks": blocks,
        "ln_final": {"scale": jnp.asarray(sd["ln_final.weight"].astype(np.float32)),
                     "bias": jnp.asarray(sd["ln_final.bias"].astype(np.float32))},
        "text_projection": jnp.asarray(sd["text_projection"].astype(np.float32)),
    }


def clip_params_from_openai(state_dict, cfg: CLIPConfig) -> Params:
    """Convert an OpenAI CLIP state dict (the format ``clip.load`` uses,
    reference clip.py:134) to our pytree.  Handles both ViT
    (``visual.class_embedding``) and RN (``visual.attnpool.*``) layouts."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    vis, txt = cfg.vision, cfg.text

    if is_resnet_config(vis):
        from clipcap_tpu.models.clip_resnet import resnet_params_from_openai

        return {
            "visual": resnet_params_from_openai(sd, vis),
            "text": _text_params_from_openai(sd, txt),
            "logit_scale": jnp.asarray(float(sd["logit_scale"]), jnp.float32),
        }

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(vis.layers):
            a = sd[fmt.format(i)]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs).astype(np.float32))

    def blocks(prefix, layers):
        return {
            "ln_1": {"scale": stack(prefix + ".{}.ln_1.weight"),
                     "bias": stack(prefix + ".{}.ln_1.bias")},
            "attn": {
                # torch MHA in_proj_weight is [3D, D] → transpose to [D, 3D]
                "in_proj": {"w": stack(prefix + ".{}.attn.in_proj_weight", transpose=True),
                            "b": stack(prefix + ".{}.attn.in_proj_bias")},
                "out_proj": {"w": stack(prefix + ".{}.attn.out_proj.weight", transpose=True),
                             "b": stack(prefix + ".{}.attn.out_proj.bias")},
            },
            "ln_2": {"scale": stack(prefix + ".{}.ln_2.weight"),
                     "bias": stack(prefix + ".{}.ln_2.bias")},
            "mlp": {
                "c_fc": {"w": stack(prefix + ".{}.mlp.c_fc.weight", transpose=True),
                         "b": stack(prefix + ".{}.mlp.c_fc.bias")},
                "c_proj": {"w": stack(prefix + ".{}.mlp.c_proj.weight", transpose=True),
                           "b": stack(prefix + ".{}.mlp.c_proj.bias")},
            },
        }

    # Conv2d weight [D, 3, p, p] → [D, 3·p·p] → transpose → [3·p·p, D];
    # flattened order (c, ph, pw) matches patchify().
    conv_w = sd["visual.conv1.weight"].astype(np.float32)
    patch_w = conv_w.reshape(conv_w.shape[0], -1).T

    params: Params = {
        "visual": {
            "patch_embed": {"w": jnp.asarray(patch_w)},
            "class_embedding": jnp.asarray(sd["visual.class_embedding"].astype(np.float32)),
            "positional_embedding": jnp.asarray(sd["visual.positional_embedding"].astype(np.float32)),
            "ln_pre": {"scale": jnp.asarray(sd["visual.ln_pre.weight"].astype(np.float32)),
                       "bias": jnp.asarray(sd["visual.ln_pre.bias"].astype(np.float32))},
            "blocks": blocks("visual.transformer.resblocks", vis.layers),
            "ln_post": {"scale": jnp.asarray(sd["visual.ln_post.weight"].astype(np.float32)),
                        "bias": jnp.asarray(sd["visual.ln_post.bias"].astype(np.float32))},
            "proj": jnp.asarray(sd["visual.proj"].astype(np.float32)),
        },
        "text": _text_params_from_openai(sd, txt),
        "logit_scale": jnp.asarray(float(sd["logit_scale"]), jnp.float32),
    }
    return params


def clip_config_from_openai(state_dict) -> CLIPConfig:
    """Infer the variant config from an OpenAI state dict's shapes (the same
    trick clip.load's build_model uses).  RN checkpoints are recognized by
    their attention-pool keys."""
    sd = state_dict
    if "visual.attnpool.positional_embedding" in sd:
        from clipcap_tpu.models.clip_resnet import resnet_config_from_openai

        rn = resnet_config_from_openai(sd)
        embed = rn.embed_dim
        twidth = _to_np(sd["ln_final.weight"]).shape[0]
        tlayers = len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks.")})
        vocab = _to_np(sd["token_embedding.weight"]).shape[0]
        ctx = _to_np(sd["positional_embedding"]).shape[0]
        return CLIPConfig(
            name=f"RN-{rn.width}x{rn.layers}",
            vision=rn,
            text=CLIPTextConfig(vocab_size=vocab, context_length=ctx,
                                width=twidth, layers=tlayers,
                                heads=twidth // 64, embed_dim=embed),
        )
    vwidth = _to_np(sd["visual.conv1.weight"]).shape[0]
    patch = _to_np(sd["visual.conv1.weight"]).shape[-1]
    grid = int(round((_to_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5))
    image_size = grid * patch
    vlayers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")})
    embed = _to_np(sd["text_projection"]).shape[1]
    twidth = _to_np(sd["ln_final.weight"]).shape[0]
    tlayers = len({k.split(".")[2] for k in sd
                   if k.startswith("transformer.resblocks.")})
    vocab = _to_np(sd["token_embedding.weight"]).shape[0]
    ctx = _to_np(sd["positional_embedding"]).shape[0]
    return CLIPConfig(
        name=f"ViT-{vwidth}/{patch}",
        vision=CLIPVisionConfig(image_size=image_size, patch_size=patch,
                                width=vwidth, layers=vlayers, heads=vwidth // 64,
                                embed_dim=embed),
        text=CLIPTextConfig(vocab_size=vocab, context_length=ctx, width=twidth,
                            layers=tlayers, heads=twidth // 64, embed_dim=embed),
    )


def load_clip(variant: str, checkpoint_path: Optional[str] = None):
    """Resolve CLIP weights: local checkpoint → HF hub → random init.

    Returns ``(params, config)``.  ``checkpoint_path`` may be an OpenAI
    ``.pt`` (jit archive or plain state dict).
    """
    cfg = get_clip_config(variant)
    if cfg.name.startswith("test-tiny"):  # test presets have no pretrained weights
        return init_clip(cfg), cfg
    if checkpoint_path:
        sd = _load_openai_checkpoint(checkpoint_path)
        return clip_params_from_openai(sd, clip_config_from_openai(sd)), clip_config_from_openai(sd)

    env = None
    import os

    for candidate in (
        os.environ.get("CLIPCAP_CLIP_CHECKPOINT"),
        os.path.expanduser(f"~/.cache/clip/{variant.replace('/', '-')}.pt"),
    ):
        if candidate and os.path.exists(candidate):
            env = candidate
            break
    if env:
        sd = _load_openai_checkpoint(env)
        real_cfg = clip_config_from_openai(sd)
        return clip_params_from_openai(sd, real_cfg), real_cfg

    try:
        from transformers import CLIPModel as HFCLIPModel

        hf_name = {
            "ViT-B/32": "openai/clip-vit-base-patch32",
            "ViT-B/16": "openai/clip-vit-base-patch16",
            "ViT-L/14": "openai/clip-vit-large-patch14",
            "ViT-L/14@336px": "openai/clip-vit-large-patch14-336",
        }[variant.replace("_", "/")]
        model = HFCLIPModel.from_pretrained(hf_name)
        return clip_params_from_hf(model.state_dict(), cfg), cfg
    except Exception:
        pass

    import warnings

    warnings.warn(
        f"Could not load pretrained CLIP '{variant}' (offline, no local "
        "checkpoint). Using RANDOM weights — fine for benchmarks, wrong for "
        "real captioning."
    )
    return init_clip(cfg), cfg


def _load_openai_checkpoint(path: str):
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        return model.state_dict()
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)


def clip_params_from_hf(state_dict, cfg: CLIPConfig) -> Params:
    """Convert an HF ``CLIPModel`` state dict (separate q/k/v projections)
    to our fused-in_proj pytree."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    vis, txt = cfg.vision, cfg.text

    def blocks(prefix, layers):
        ln1s, ln1b, ln2s, ln2b = [], [], [], []
        inw, inb, outw, outb = [], [], [], []
        fcw, fcb, pw, pb = [], [], [], []
        for i in range(layers):
            p = f"{prefix}.{i}"
            ln1s.append(sd[f"{p}.layer_norm1.weight"]); ln1b.append(sd[f"{p}.layer_norm1.bias"])
            ln2s.append(sd[f"{p}.layer_norm2.weight"]); ln2b.append(sd[f"{p}.layer_norm2.bias"])
            qw, kw, vw = (sd[f"{p}.self_attn.{n}_proj.weight"] for n in "qkv")
            qb, kb, vb = (sd[f"{p}.self_attn.{n}_proj.bias"] for n in "qkv")
            inw.append(np.concatenate([qw, kw, vw], axis=0).T)  # [D, 3D]
            inb.append(np.concatenate([qb, kb, vb], axis=0))
            outw.append(sd[f"{p}.self_attn.out_proj.weight"].T)
            outb.append(sd[f"{p}.self_attn.out_proj.bias"])
            fcw.append(sd[f"{p}.mlp.fc1.weight"].T); fcb.append(sd[f"{p}.mlp.fc1.bias"])
            pw.append(sd[f"{p}.mlp.fc2.weight"].T); pb.append(sd[f"{p}.mlp.fc2.bias"])

        j = lambda arrs: jnp.asarray(np.stack(arrs).astype(np.float32))
        return {
            "ln_1": {"scale": j(ln1s), "bias": j(ln1b)},
            "attn": {"in_proj": {"w": j(inw), "b": j(inb)},
                     "out_proj": {"w": j(outw), "b": j(outb)}},
            "ln_2": {"scale": j(ln2s), "bias": j(ln2b)},
            "mlp": {"c_fc": {"w": j(fcw), "b": j(fcb)},
                    "c_proj": {"w": j(pw), "b": j(pb)}},
        }

    conv_w = sd["vision_model.embeddings.patch_embedding.weight"].astype(np.float32)
    patch_w = conv_w.reshape(conv_w.shape[0], -1).T

    return {
        "visual": {
            "patch_embed": {"w": jnp.asarray(patch_w)},
            "class_embedding": jnp.asarray(
                sd["vision_model.embeddings.class_embedding"].astype(np.float32)),
            "positional_embedding": jnp.asarray(
                sd["vision_model.embeddings.position_embedding.weight"].astype(np.float32)),
            "ln_pre": {"scale": jnp.asarray(sd["vision_model.pre_layrnorm.weight"].astype(np.float32)),
                       "bias": jnp.asarray(sd["vision_model.pre_layrnorm.bias"].astype(np.float32))},
            "blocks": blocks("vision_model.encoder.layers", vis.layers),
            "ln_post": {"scale": jnp.asarray(sd["vision_model.post_layernorm.weight"].astype(np.float32)),
                        "bias": jnp.asarray(sd["vision_model.post_layernorm.bias"].astype(np.float32))},
            "proj": jnp.asarray(sd["visual_projection.weight"].T.astype(np.float32)),
        },
        "text": {
            "token_embedding": jnp.asarray(
                sd["text_model.embeddings.token_embedding.weight"].astype(np.float32)),
            "positional_embedding": jnp.asarray(
                sd["text_model.embeddings.position_embedding.weight"].astype(np.float32)),
            "blocks": blocks("text_model.encoder.layers", txt.layers),
            "ln_final": {"scale": jnp.asarray(sd["text_model.final_layer_norm.weight"].astype(np.float32)),
                         "bias": jnp.asarray(sd["text_model.final_layer_norm.bias"].astype(np.float32))},
            "text_projection": jnp.asarray(sd["text_projection.weight"].T.astype(np.float32)),
        },
        "logit_scale": jnp.asarray(float(sd["logit_scale"]), jnp.float32),
    }
