"""OpenAI CLIP ModifiedResNet image towers in pure JAX (RN50 family).

Capability parity: the reference's encoder layer serves every variant
``clip.load`` accepts (/root/reference/clipcap/encoders/clip.py:134-136),
which includes RN50, RN101, RN50x4, RN50x16 and RN50x64 alongside the ViTs.
This module provides those towers; the text side is the same causal
transformer as the ViT checkpoints (``models/clip_vit.py``).

Architecture (OpenAI's "ModifiedResNet", clean-room from the published
model description):
* a 3-conv stem (3×3 stride-2, then two 3×3) with BatchNorm+ReLU after
  each conv, followed by a 2×2 average pool — replacing the usual 7×7/maxpool;
* four bottleneck stages with expansion 4; anti-aliased downsampling — a
  stride-1 3×3 conv followed by a stride-sized average pool (both in the
  residual branch and in the shortcut, where the pool PRECEDES the 1×1
  projection conv);
* a final multi-head attention pool over the 7×7 grid with a learned
  positional embedding, querying from the mean-pooled token.

TPU-first decisions:
* NHWC activations / HWIO kernels throughout — XLA:TPU's native conv
  layout; no NCHW translation of the torch graph.
* BatchNorm is inference-only here (the encoder is frozen by design), so
  each BN is pre-reduced at import time to a per-channel ``scale``/``bias``
  pair (``scale = γ/√(var+ε)``, ``bias = β − mean·scale``) — one FMA that
  XLA fuses into the adjacent conv, instead of four-tensor BN math.
* Each stage's tail blocks (identical shapes) run under one ``lax.scan`` —
  8 compiled block bodies for RN50x64's 64 blocks instead of 64.
* Pixel normalization happens on device in the compute dtype; it fuses
  into the stem conv's input and the host pipeline ships uint8 (same
  contract as the ViT path).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.ops.layers import linear

Array = jax.Array
Params = Dict[str, Any]

EXPANSION = 4  # bottleneck expansion factor


@dataclasses.dataclass(frozen=True)
class CLIPResNetConfig:
    """Vision-side config for a ModifiedResNet tower.

    ``width`` is the stem output width (64 for RN50/RN101); stage c
    channel plans are ``width·2^c`` with expansion 4, so the attention-pool
    width is ``width·32``. ``embed_dim`` is the joint embedding size.
    """
    image_size: int = 224
    width: int = 64
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    heads: int = 32  # attention-pool heads (width·32/64)
    embed_dim: int = 1024

    @property
    def pool_width(self) -> int:
        return self.width * 32

    @property
    def grid(self) -> int:
        # stem: /4 (stride-2 conv + 2×2 avgpool); stages 2-4: /2 each → /32
        return self.image_size // 32


# ---------------------------------------------------------------------------
# Init (shapes mirror the OpenAI checkpoints; values torch-style fan-in)
# ---------------------------------------------------------------------------


def _conv_init(rng: np.random.Generator, kh: int, kw: int, cin: int, cout: int) -> jnp.ndarray:
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    return jnp.asarray(rng.uniform(-bound, bound, (kh, kw, cin, cout)).astype(np.float32))


def _bn_init(n: int) -> Params:
    # Pre-reduced inference form (identity transform at init).
    return {"scale": jnp.ones((n,), jnp.float32), "bias": jnp.zeros((n,), jnp.float32)}


def _block_init(rng, cin: int, planes: int, stride: int, downsample: bool) -> Params:
    p: Params = {
        "conv1": {"w": _conv_init(rng, 1, 1, cin, planes)},
        "bn1": _bn_init(planes),
        "conv2": {"w": _conv_init(rng, 3, 3, planes, planes)},
        "bn2": _bn_init(planes),
        "conv3": {"w": _conv_init(rng, 1, 1, planes, planes * EXPANSION)},
        "bn3": _bn_init(planes * EXPANSION),
    }
    if downsample:
        p["downsample"] = {
            "conv": {"w": _conv_init(rng, 1, 1, cin, planes * EXPANSION)},
            "bn": _bn_init(planes * EXPANSION),
        }
    return p


def init_clip_resnet(cfg: CLIPResNetConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    w = cfg.width
    stem = {
        "conv1": {"w": _conv_init(rng, 3, 3, 3, w // 2)}, "bn1": _bn_init(w // 2),
        "conv2": {"w": _conv_init(rng, 3, 3, w // 2, w // 2)}, "bn2": _bn_init(w // 2),
        "conv3": {"w": _conv_init(rng, 3, 3, w // 2, w)}, "bn3": _bn_init(w),
    }
    stages = []
    cin = w
    for s, n_blocks in enumerate(cfg.layers):
        planes = w * (2 ** s)
        stride = 1 if s == 0 else 2
        block0 = _block_init(rng, cin, planes, stride, downsample=True)
        cin = planes * EXPANSION
        tail = None
        if n_blocks > 1:
            tails = [_block_init(rng, cin, planes, 1, downsample=False)
                     for _ in range(n_blocks - 1)]
            tail = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tails)
        stages.append({"block0": block0, "tail": tail})

    pw = cfg.pool_width
    sd = cfg.grid
    bound = 1.0 / np.sqrt(pw)

    def lin(nin, nout):
        return {"w": jnp.asarray(rng.uniform(-bound, bound, (nin, nout)).astype(np.float32)),
                "b": jnp.zeros((nout,), jnp.float32)}

    attnpool = {
        "positional_embedding": jnp.asarray(
            (rng.standard_normal((sd * sd + 1, pw)) / np.sqrt(pw)).astype(np.float32)),
        "q_proj": lin(pw, pw), "k_proj": lin(pw, pw), "v_proj": lin(pw, pw),
        "c_proj": lin(pw, cfg.embed_dim),
    }
    return {"stem": stem, "stages": stages, "attnpool": attnpool}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x: Array, w: Array, stride: int = 1, padding: int = 0, precision=None) -> Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=_DN, precision=precision)


def _bn(x: Array, bn: Params) -> Array:
    return x * bn["scale"].astype(x.dtype) + bn["bias"].astype(x.dtype)


def _avg_pool(x: Array, k: int) -> Array:
    if k == 1:
        return x
    out = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                                (1, k, k, 1), (1, k, k, 1), "VALID")
    return out / jnp.asarray(k * k, x.dtype)


def _bottleneck(x: Array, p: Params, stride: int, precision=None) -> Array:
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]["w"], precision=precision), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]["w"], padding=1, precision=precision), p["bn2"]))
    out = _avg_pool(out, stride)  # anti-aliased downsample (pool after 3×3)
    out = _bn(_conv(out, p["conv3"]["w"], precision=precision), p["bn3"])
    if "downsample" in p:
        # shortcut: pool FIRST, then 1×1 projection (OpenAI block ordering)
        identity = _avg_pool(x, stride)
        identity = _bn(_conv(identity, p["downsample"]["conv"]["w"], precision=precision),
                       p["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(x: Array, p: Params, heads: int, precision=None) -> Array:
    """[B, H, W, C] → [B, embed_dim]: mean-query multi-head attention over
    the grid + mean token, learned positional embedding."""
    B, H, W, C = x.shape
    x = x.reshape(B, H * W, C)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # [B, HW+1, C]
    x = x + p["positional_embedding"].astype(x.dtype)[None]

    q = linear(x[:, :1], p["q_proj"]["w"], p["q_proj"]["b"], precision)  # [B, 1, C]
    k = linear(x, p["k_proj"]["w"], p["k_proj"]["b"], precision)
    v = linear(x, p["v_proj"]["w"], p["v_proj"]["b"], precision)

    Dh = C // heads
    q = q.reshape(B, 1, heads, Dh)
    k = k.reshape(B, -1, heads, Dh)
    v = v.reshape(B, -1, heads, Dh)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, precision=precision) * (Dh ** -0.5)
    wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", wts, v, precision=precision).reshape(B, 1, C)
    return linear(out, p["c_proj"]["w"], p["c_proj"]["b"], precision)[:, 0]


def clip_encode_image_resnet(
    params: Params,
    cfg: CLIPResNetConfig,
    images: Array,  # [B, H, W, 3] uint8 or float in [0, 1]
    *,
    dtype=jnp.float32,
    precision=None,
    normalize_pixels: bool = True,
) -> Array:
    """ModifiedResNet forward → [B, embed_dim] joint-space embeddings
    (``model.encode_image`` for RN checkpoints, reference clip.py:121).

    Pixel normalization stays an explicit elementwise op here (unlike the
    ViT's weight-fold): the stem conv has spatial extent and zero padding,
    so folding the shift into a bias would be wrong at image borders. XLA
    fuses the FMA into the conv input read anyway."""
    from clipcap_tpu.models.clip_vit import IMAGE_MEAN, IMAGE_STD

    x = images.astype(dtype)
    if images.dtype == jnp.uint8:
        x = x / jnp.asarray(255.0, dtype)
    if normalize_pixels:
        mean = jnp.asarray(IMAGE_MEAN, dtype)
        std = jnp.asarray(IMAGE_STD, dtype)
        x = (x - mean) / std

    stem = params["stem"]
    x = jax.nn.relu(_bn(_conv(x, stem["conv1"]["w"], stride=2, padding=1,
                              precision=precision), stem["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv2"]["w"], padding=1,
                              precision=precision), stem["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv3"]["w"], padding=1,
                              precision=precision), stem["bn3"]))
    x = _avg_pool(x, 2)

    for s, stage in enumerate(params["stages"]):
        stride = 1 if s == 0 else 2
        x = _bottleneck(x, stage["block0"], stride, precision=precision)
        if stage["tail"] is not None:
            def scan_fn(carry, block):
                return _bottleneck(carry, block, 1, precision=precision), None

            x, _ = jax.lax.scan(scan_fn, x, stage["tail"])

    return _attention_pool(x, params["attnpool"], cfg.heads, precision=precision)


# ---------------------------------------------------------------------------
# Weight import (OpenAI `clip` RN checkpoints)
# ---------------------------------------------------------------------------


# one tensor-conversion helper for every checkpoint importer (a torch
# dtype handled there must behave identically for ViT and RN imports)
from clipcap_tpu.models.clip_vit import _to_np


def _import_conv(sd, key) -> Params:
    # torch Conv2d weight [O, I, kh, kw] → HWIO [kh, kw, I, O]
    w = _to_np(sd[key]).astype(np.float32).transpose(2, 3, 1, 0)
    return {"w": jnp.asarray(w)}


def _import_bn(sd, prefix, eps: float = 1e-5) -> Params:
    gamma = _to_np(sd[f"{prefix}.weight"]).astype(np.float64)
    beta = _to_np(sd[f"{prefix}.bias"]).astype(np.float64)
    mean = _to_np(sd[f"{prefix}.running_mean"]).astype(np.float64)
    var = _to_np(sd[f"{prefix}.running_var"]).astype(np.float64)
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return {"scale": jnp.asarray(scale.astype(np.float32)),
            "bias": jnp.asarray(bias.astype(np.float32))}


def _import_block(sd, prefix) -> Params:
    p = {
        "conv1": _import_conv(sd, f"{prefix}.conv1.weight"),
        "bn1": _import_bn(sd, f"{prefix}.bn1"),
        "conv2": _import_conv(sd, f"{prefix}.conv2.weight"),
        "bn2": _import_bn(sd, f"{prefix}.bn2"),
        "conv3": _import_conv(sd, f"{prefix}.conv3.weight"),
        "bn3": _import_bn(sd, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample"] = {
            "conv": _import_conv(sd, f"{prefix}.downsample.0.weight"),
            "bn": _import_bn(sd, f"{prefix}.downsample.1"),
        }
    return p


def resnet_params_from_openai(state_dict, cfg: CLIPResNetConfig) -> Params:
    """Convert the ``visual.*`` half of an OpenAI RN state dict to our
    pytree (the text half converts via ``clip_vit.clip_params_from_openai``'s
    text path; see ``clip_vit`` dispatch)."""
    sd = state_dict
    stem = {
        "conv1": _import_conv(sd, "visual.conv1.weight"), "bn1": _import_bn(sd, "visual.bn1"),
        "conv2": _import_conv(sd, "visual.conv2.weight"), "bn2": _import_bn(sd, "visual.bn2"),
        "conv3": _import_conv(sd, "visual.conv3.weight"), "bn3": _import_bn(sd, "visual.bn3"),
    }
    stages = []
    for s, n_blocks in enumerate(cfg.layers):
        prefix = f"visual.layer{s + 1}"
        block0 = _import_block(sd, f"{prefix}.0")
        tail = None
        if n_blocks > 1:
            tails = [_import_block(sd, f"{prefix}.{i}") for i in range(1, n_blocks)]
            tail = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tails)
        stages.append({"block0": block0, "tail": tail})

    def lin(name):
        return {"w": jnp.asarray(_to_np(sd[f"visual.attnpool.{name}.weight"]).astype(np.float32).T),
                "b": jnp.asarray(_to_np(sd[f"visual.attnpool.{name}.bias"]).astype(np.float32))}

    attnpool = {
        "positional_embedding": jnp.asarray(
            _to_np(sd["visual.attnpool.positional_embedding"]).astype(np.float32)),
        "q_proj": lin("q_proj"), "k_proj": lin("k_proj"),
        "v_proj": lin("v_proj"), "c_proj": lin("c_proj"),
    }
    return {"stem": stem, "stages": stages, "attnpool": attnpool}


def resnet_config_from_openai(state_dict) -> CLIPResNetConfig:
    """Infer the RN variant config from a state dict's shapes (mirrors the
    counting trick ``clip.load``'s build_model uses)."""
    sd = state_dict
    width = _to_np(sd["visual.layer1.0.conv1.weight"]).shape[0]
    layers = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
        for b in (1, 2, 3, 4))
    embed_dim = _to_np(sd["visual.attnpool.c_proj.weight"]).shape[0]
    pool_width = _to_np(sd["visual.attnpool.positional_embedding"]).shape[1]
    spacial = int(round((_to_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5))
    return CLIPResNetConfig(
        image_size=spacial * 32, width=width, layers=layers,
        heads=pool_width // 64, embed_dim=embed_dim)
