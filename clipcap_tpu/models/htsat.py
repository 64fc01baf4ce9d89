"""HTS-AT audio transformer (the CLAP audio tower) in pure JAX.

Capability parity with the reference's CLAP encoder, which wraps
``laion_clap.CLAP_Module`` (/root/reference/clipcap/encoders/clap.py:134-147
— shipped broken: undefined ``model_id``/``use_windowed_embeddings``
NameErrors, clap.py:136,152; fixed here, not ported).  The audio branch is
HTS-AT (Chen et al. 2022): a swin transformer over a log-mel "image".

Pipeline (HTSAT-tiny / CLAP audio config):
  48 kHz mono → log-mel [T≈1001, 64] → per-mel-bin batch-norm →
  time/freq fold to a 256×256 image (freq_ratio 4) → 4×4 patch embed
  (dim 96) → swin stages depths [2,2,6,2], heads [4,8,16,32], window 8,
  relative position bias, shifted windows → final norm → token mean-pool
  (768) → CLAP audio projection MLP (768→512→512).

Weight import maps ``laion_clap`` checkpoint keys (``audio_branch.*``,
``audio_projection.*``).  Fusion checkpoints (``enable_fusion=True``) load
their shared trunk; the fusion-specific branches (mel_conv2d/AFF) apply
only to >10 s audio and are not implemented — long audio is truncated to
the 10 s training window (documented divergence).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.ops.audio import (
    CLAP_CLIP_SAMPLES,
    log_mel_spectrogram,
)
from clipcap_tpu.ops.layers import layer_norm, linear

Array = jax.Array
Params = Dict[str, Any]

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    in_chans: int = 1
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    freq_ratio: int = 4
    n_mels: int = 64
    embedding_dim: int = 512   # CLAP joint space
    latent_dim: int = 768      # embed_dim * 2**(n_stages-1)
    enable_fusion: bool = False  # laion_clap fusion variant (>10 s audio)
    name: str = "HTSAT-tiny"


CLAP_PRESETS = {
    "HTSAT-tiny": HTSATConfig(),
    # test-scale preset: tiny swin for integration tests / smoke runs
    "test-tiny": HTSATConfig(spec_size=64, embed_dim=16, depths=(1, 1),
                             heads=(2, 4), window_size=4, freq_ratio=4,
                             latent_dim=32, embedding_dim=16, name="test-tiny"),
}


def get_htsat_config(variant: str) -> HTSATConfig:
    if variant in CLAP_PRESETS:
        return CLAP_PRESETS[variant]
    raise ValueError(f"unknown CLAP audio variant '{variant}'. Known: {sorted(CLAP_PRESETS)}")


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _trunc_normal(rng, shape, std=0.02):
    return jnp.asarray(np.clip(rng.normal(0, std, size=shape), -2 * std, 2 * std)
                       .astype(np.float32))


def init_htsat(cfg: HTSATConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    n_stages = len(cfg.depths)
    ws = cfg.window_size

    def ln(n):
        return {"scale": jnp.ones((n,), jnp.float32), "bias": jnp.zeros((n,), jnp.float32)}

    params: Params = {
        "bn0": {"scale": jnp.ones((cfg.n_mels,), jnp.float32),
                "bias": jnp.zeros((cfg.n_mels,), jnp.float32),
                "mean": jnp.zeros((cfg.n_mels,), jnp.float32),
                "var": jnp.ones((cfg.n_mels,), jnp.float32)},
        "patch_embed": {
            "proj": {"w": _trunc_normal(rng, (cfg.patch_size * cfg.patch_size * cfg.in_chans,
                                              cfg.embed_dim)),
                     "b": jnp.zeros((cfg.embed_dim,), jnp.float32)},
            "norm": ln(cfg.embed_dim),
        },
        "stages": [],
        "norm": ln(cfg.embed_dim * 2 ** (n_stages - 1)),
        "audio_projection": {
            "fc1": {"w": _trunc_normal(rng, (cfg.latent_dim, cfg.embedding_dim)),
                    "b": jnp.zeros((cfg.embedding_dim,), jnp.float32)},
            "fc2": {"w": _trunc_normal(rng, (cfg.embedding_dim, cfg.embedding_dim)),
                    "b": jnp.zeros((cfg.embedding_dim,), jnp.float32)},
        },
    }

    if cfg.enable_fusion:
        inter = max(1, cfg.embed_dim // 4)
        params["patch_embed"]["mel_conv2d"] = {
            "w": _trunc_normal(rng, (cfg.patch_size * 3 * cfg.patch_size * cfg.in_chans,
                                     cfg.embed_dim)),
            "b": jnp.zeros((cfg.embed_dim,), jnp.float32),
        }
        params["patch_embed"]["fusion"] = init_aff(cfg.embed_dim, inter, rng)

    for s in range(n_stages):
        dim = cfg.embed_dim * 2 ** s
        heads = cfg.heads[s]
        blocks = []
        for _ in range(cfg.depths[s]):
            blocks.append({
                "norm1": ln(dim),
                "attn": {
                    "qkv": {"w": _trunc_normal(rng, (dim, 3 * dim)),
                            "b": jnp.zeros((3 * dim,), jnp.float32)},
                    "proj": {"w": _trunc_normal(rng, (dim, dim)),
                             "b": jnp.zeros((dim,), jnp.float32)},
                    "rel_bias": _trunc_normal(rng, ((2 * ws - 1) ** 2, heads)),
                },
                "norm2": ln(dim),
                "mlp": {
                    "fc1": {"w": _trunc_normal(rng, (dim, int(dim * cfg.mlp_ratio))),
                            "b": jnp.zeros((int(dim * cfg.mlp_ratio),), jnp.float32)},
                    "fc2": {"w": _trunc_normal(rng, (int(dim * cfg.mlp_ratio), dim)),
                            "b": jnp.zeros((dim,), jnp.float32)},
                },
            })
        stage: Params = {"blocks": blocks}
        if s < n_stages - 1:
            stage["downsample"] = {
                "norm": ln(4 * dim),
                "reduction": {"w": _trunc_normal(rng, (4 * dim, 2 * dim))},
            }
        params["stages"].append(stage)
    return params


def init_aff(channels: int, inter: int, rng) -> Params:
    """AFF (attentional feature fusion, Dai et al. 2021) — the 2-D variant
    laion_clap's fusion HTSAT uses to merge local-chunk features into the
    global patch embedding (``fusion_model`` in fusion checkpoints)."""

    def bn(n):
        return {"scale": jnp.ones((n,), jnp.float32),
                "bias": jnp.zeros((n,), jnp.float32),
                "mean": jnp.zeros((n,), jnp.float32),
                "var": jnp.ones((n,), jnp.float32)}

    def conv(cin, cout):
        return {"w": _trunc_normal(rng, (cin, cout)), "b": jnp.zeros((cout,), jnp.float32)}

    return {
        "local": {"conv1": conv(channels, inter), "bn1": bn(inter),
                  "conv2": conv(inter, channels), "bn2": bn(channels)},
        "global": {"conv1": conv(channels, inter), "bn1": bn(inter),
                   "conv2": conv(inter, channels), "bn2": bn(channels)},
    }


def _bn_apply(x: Array, bn: Params) -> Array:
    return ((x - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5)
            * bn["scale"] + bn["bias"])


def _aff_branch(x: Array, p: Params, precision) -> Array:
    h = linear(x, p["conv1"]["w"], p["conv1"]["b"], precision)
    h = jnp.maximum(_bn_apply(h, p["bn1"]), 0)
    h = linear(h, p["conv2"]["w"], p["conv2"]["b"], precision)
    return _bn_apply(h, p["bn2"])


def aff_fuse(fusion: Params, x: Array, residual: Array, precision=None) -> Array:
    """AFF forward (channel-last [..., H, W, C]): MS-CAM attention over the
    sum, then a soft swap: ``2·x·w + 2·residual·(1-w)``."""
    xa = x + residual
    xl = _aff_branch(xa, fusion["local"], precision)
    xg = _aff_branch(jnp.mean(xa, axis=(-3, -2), keepdims=True),
                     fusion["global"], precision)
    wei = jax.nn.sigmoid(xl + xg)
    return 2.0 * x * wei + 2.0 * residual * (1.0 - wei)


# ---------------------------------------------------------------------------
# Swin pieces
# ---------------------------------------------------------------------------


def _rel_position_index(ws: int) -> np.ndarray:
    """Standard swin relative-position index [ws², ws²]."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _window_partition(x: Array, ws: int) -> Array:
    """[B, H, W, C] → [B·nW, ws², C]"""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _window_reverse(windows: Array, ws: int, H: int, W: int) -> Array:
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def _shift_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: [nW, ws², ws²] additive.
    Pure numpy — a host-side constant baked into the compiled program."""
    img = np.zeros((H, W))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, NEG_INF, 0.0).astype(np.float32)


def _swin_block(x: Array, block: Params, H: int, W: int, heads: int, ws: int,
                shift: int, dtype, precision) -> Array:
    B, N, C = x.shape
    Dh = C // heads

    h = layer_norm(x, block["norm1"]["scale"], block["norm1"]["bias"])
    h = h.reshape(B, H, W, C)
    if shift > 0:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    windows = _window_partition(h, ws)  # [B·nW, ws², C]

    qkv = linear(windows, block["attn"]["qkv"]["w"], block["attn"]["qkv"]["b"], precision)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    nW = windows.shape[0]
    M = ws * ws
    q = q.reshape(nW, M, heads, Dh)
    k = k.reshape(nW, M, heads, Dh)
    v = v.reshape(nW, M, heads, Dh)
    logits = jnp.einsum("wnhd,wmhd->whnm", q, k, precision=precision) * (Dh ** -0.5)
    logits = logits.astype(jnp.float32)

    idx = _rel_position_index(ws)
    bias = block["attn"]["rel_bias"][jnp.asarray(idx.reshape(-1))]
    bias = bias.reshape(M, M, heads).transpose(2, 0, 1)  # [heads, M, M]
    logits = logits + bias[None].astype(jnp.float32)

    if shift > 0:
        mask = jnp.asarray(_shift_mask(H, W, ws, shift))  # [nW_img, M, M]
        n_img_windows = mask.shape[0]
        logits = logits.reshape(B, n_img_windows, heads, M, M)
        logits = logits + mask[None, :, None]
        logits = logits.reshape(nW, heads, M, M)

    weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("whnm,wmhd->wnhd", weights, v, precision=precision)
    attn = attn.reshape(nW, M, C)
    attn = linear(attn, block["attn"]["proj"]["w"], block["attn"]["proj"]["b"], precision)

    attn = _window_reverse(attn, ws, H, W)
    if shift > 0:
        attn = jnp.roll(attn, (shift, shift), axis=(1, 2))
    x = x + attn.reshape(B, N, C)

    h = layer_norm(x, block["norm2"]["scale"], block["norm2"]["bias"])
    h = linear(h, block["mlp"]["fc1"]["w"], block["mlp"]["fc1"]["b"], precision)
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, block["mlp"]["fc2"]["w"], block["mlp"]["fc2"]["b"], precision)
    return x + h


def _patch_merge(x: Array, stage: Params, H: int, W: int, precision) -> Array:
    """Swin PatchMerging: 2×2 neighbors → LN → linear 4C→2C (bias-free)."""
    B, N, C = x.shape
    x = x.reshape(B, H, W, C)
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(B, N // 4, 4 * C)
    x = layer_norm(x, stage["downsample"]["norm"]["scale"], stage["downsample"]["norm"]["bias"])
    return linear(x, stage["downsample"]["reduction"]["w"], None, precision)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def reshape_wav2img(x: Array, cfg: HTSATConfig) -> Array:
    """Fold the mel spectrogram [B, 1, T, F] into a square image
    [B, 1, freq_ratio·F, T/freq_ratio] (HTS-AT time/freq folding)."""
    B, C, T, F = x.shape
    target_T = cfg.spec_size * cfg.freq_ratio
    target_F = cfg.spec_size // cfg.freq_ratio
    if T != target_T or F != target_F:
        x = jax.image.resize(x, (B, C, target_T, target_F), method="bicubic")
    T, F = target_T, target_F
    x = jnp.transpose(x, (0, 1, 3, 2))                          # B,C,F,T
    x = x.reshape(B, C, F, cfg.freq_ratio, T // cfg.freq_ratio)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))                        # B,C,r,F,T'
    return x.reshape(B, C, cfg.freq_ratio * F, T // cfg.freq_ratio)


def _apply_bn0(params: Params, x: Array) -> Array:
    """bn0: BatchNorm2d over the mel-bin axis, inference mode."""
    bn = params["bn0"]
    x = (x - bn["mean"][None, None, None, :]) * jax.lax.rsqrt(bn["var"][None, None, None, :] + 1e-5)
    return x * bn["scale"][None, None, None, :] + bn["bias"][None, None, None, :]


def _patchify(img: Array, ph: int, pw: int) -> Array:
    """[B, H, W, C] → [B, H//ph, W//pw, C*ph*pw] (conv-weight flatten order
    (C, ph, pw), matching ``conv_w.reshape(D, -1).T`` import)."""
    B, H, W, C = img.shape
    gh, gw = H // ph, W // pw
    img = img[:, :gh * ph, :gw * pw]
    patches = img.reshape(B, gh, ph, gw, pw, C)
    return patches.transpose(0, 1, 3, 5, 2, 4).reshape(B, gh, gw, C * ph * pw)


def _swin_trunk(params: Params, cfg: HTSATConfig, x: Array, H: int, W: int,
                dtype, precision) -> Array:
    """Patch tokens [B, H·W, D] → pooled latent [B, latent_dim]."""
    ws = cfg.window_size
    for s, stage in enumerate(params["stages"]):
        heads = cfg.heads[s]
        cur_ws = min(ws, H)  # window == resolution → no shift possible
        for j, block in enumerate(stage["blocks"]):
            shift = 0 if (j % 2 == 0 or cur_ws == H) else cur_ws // 2
            x = _swin_block(x, block, H, W, heads, cur_ws, shift, dtype, precision)
        if "downsample" in stage:
            x = _patch_merge(x, stage, H, W, precision)
            H //= 2
            W //= 2

    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    return jnp.mean(x, axis=1)  # token mean-pool = avgpool of feature map


def htsat_latent(params: Params, cfg: HTSATConfig, mel: Array, *,
                 dtype=jnp.float32, precision=None) -> Array:
    """log-mel [B, T, F] → pooled latent [B, latent_dim] (the checkpoint's
    'embedding' output: token mean-pool of the final normed feature map)."""
    x = _apply_bn0(params, mel.astype(jnp.float32)[:, None])  # B,1,T,F
    x = reshape_wav2img(x, cfg)  # B,1,S,S
    x = x.astype(dtype)

    # patch embed: stride-p conv as patchify + matmul (see clip_vit.patchify)
    B = x.shape[0]
    p = cfg.patch_size
    img = jnp.transpose(x, (0, 2, 3, 1))  # B,S,S,1
    patches = _patchify(img, p, p)
    gh, gw = patches.shape[1:3]
    x = linear(patches.reshape(B, gh * gw, -1), params["patch_embed"]["proj"]["w"],
               params["patch_embed"]["proj"]["b"], precision)
    x = layer_norm(x, params["patch_embed"]["norm"]["scale"],
                   params["patch_embed"]["norm"]["bias"])
    return _swin_trunk(params, cfg, x, gh, gw, dtype, precision)


def htsat_latent_fusion(params: Params, cfg: HTSATConfig, mel_fusion: Array, *,
                        dtype=jnp.float32, precision=None) -> Array:
    """Fusion forward for the laion_clap fusion variant.

    ``mel_fusion``: [B, 4, T, F] — channel 0 the full-audio mel shrunk to
    the 10 s frame grid, channels 1-3 three 10 s chunks
    (``ops/audio.build_mel_fusion``).  Short audio replicates channel 0
    into 1-3; such rows are detected (channels identical) and bypass the
    fusion branch, reproducing laion_clap's per-sample ``longer`` gating
    with static shapes.

    Matches the fusion PatchEmbed: global channel → stride-p conv; local
    chunks → ``mel_conv2d`` (kernel/stride (p, 3·p)), the three chunks'
    frames concatenated along the width grid and padded/truncated to the
    global grid; merged via AFF; then the shared swin trunk.
    """
    B = mel_fusion.shape[0]
    longer = jnp.any(mel_fusion[:, 1] != mel_fusion[:, 0], axis=(-2, -1))

    x = _apply_bn0(params, mel_fusion.astype(jnp.float32))
    x = reshape_wav2img(x, cfg)  # B,4,S,S
    x = x.astype(dtype)
    p = cfg.patch_size

    # Global branch: channel 0 through the standard patch conv.
    g = _patchify(x[:, 0:1].transpose(0, 2, 3, 1), p, p)   # B,gh,gw,p*p
    gh, gw = g.shape[1:3]
    g = linear(g, params["patch_embed"]["proj"]["w"],
               params["patch_embed"]["proj"]["b"], precision)  # B,gh,gw,D

    # Local branch: channels 1-3 through mel_conv2d (kernel (p, 3p)).
    loc = x[:, 1:].reshape(B * 3, x.shape[2], x.shape[3])[..., None]
    loc = _patchify(loc, p, 3 * p)                          # B*3,gh,gl,3p²
    gl = loc.shape[2]
    loc = linear(loc, params["patch_embed"]["mel_conv2d"]["w"],
                 params["patch_embed"]["mel_conv2d"]["b"], precision)
    D = loc.shape[-1]
    loc = loc.reshape(B, 3, gh, gl, D).transpose(0, 2, 1, 3, 4)
    loc = loc.reshape(B, gh, 3 * gl, D)                     # chunks side by side
    if 3 * gl >= gw:
        loc = loc[:, :, :gw]
    else:
        loc = jnp.pad(loc, ((0, 0), (0, 0), (0, gw - 3 * gl), (0, 0)))

    fused = aff_fuse(params["patch_embed"]["fusion"], g, loc, precision)
    g = jnp.where(longer[:, None, None, None], fused, g)

    tokens = g.reshape(B, gh * gw, D)
    tokens = layer_norm(tokens, params["patch_embed"]["norm"]["scale"],
                        params["patch_embed"]["norm"]["bias"])
    return _swin_trunk(params, cfg, tokens, gh, gw, dtype, precision)


def clap_audio_embedding(params: Params, cfg: HTSATConfig, waveform: Array, *,
                         dtype=jnp.float32, precision=None) -> Array:
    """waveform [B, samples] @48 kHz → CLAP joint-space embedding [B, 512].

    Equivalent of ``CLAP_Module.get_audio_embedding_from_data`` (reference
    clap.py:121): int16 quantization round-trip, 10 s crop/pad, log-mel,
    HTSAT forward, audio projection MLP.
    """
    # laion_clap "int16 trick": quantize to int16 range and back.  Stays in
    # float (truncation toward zero like the int16 cast) — int16 converts
    # compile pathologically on TPU.
    x = jnp.clip(waveform, -1.0, 1.0)
    x = jnp.trunc(x * 32767.0) / 32767.0

    # fixed 10-second window (fusion path for longer audio not implemented)
    T = x.shape[1]
    if T < CLAP_CLIP_SAMPLES:
        x = jnp.pad(x, ((0, 0), (0, CLAP_CLIP_SAMPLES - T)))
    elif T > CLAP_CLIP_SAMPLES:
        x = x[:, :CLAP_CLIP_SAMPLES]

    mel = log_mel_spectrogram(x)  # [B, frames, 64]
    latent = htsat_latent(params, cfg, mel, dtype=dtype, precision=precision)
    return _audio_projection(params, latent, precision)


def _audio_projection(params: Params, latent: Array, precision=None) -> Array:
    h = linear(latent, params["audio_projection"]["fc1"]["w"],
               params["audio_projection"]["fc1"]["b"], precision)
    h = jnp.maximum(h, 0)
    return linear(h, params["audio_projection"]["fc2"]["w"],
                  params["audio_projection"]["fc2"]["b"], precision)


def clap_audio_embedding_fusion(params: Params, cfg: HTSATConfig,
                                mel_fusion: Array, *, dtype=jnp.float32,
                                precision=None) -> Array:
    """mel_fusion [B, 4, frames, 64] (host-built,
    ``ops/audio.build_mel_fusion``) → CLAP joint-space embedding [B, 512].
    The fusion answer to >10 s audio — the reference's encoder silently
    truncates it (laion_clap called without fusion, clap.py:121)."""
    latent = htsat_latent_fusion(params, cfg, mel_fusion, dtype=dtype,
                                 precision=precision)
    return _audio_projection(params, latent, precision)


# ---------------------------------------------------------------------------
# Weight import (laion_clap checkpoints)
# ---------------------------------------------------------------------------


def _to_np(x):
    if hasattr(x, "detach"):
        return x.detach().cpu().float().numpy()
    return np.asarray(x)


def htsat_params_from_laion_clap(state_dict, cfg: HTSATConfig) -> Params:
    """Convert a laion_clap checkpoint's audio branch to our pytree.

    Accepts keys with or without the ``module.`` prefix.  Fusion-only
    tensors (mel_conv2d, fusion_model) are ignored with a warning.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k[len("module."):] if k.startswith("module.") else k
        sd[k] = _to_np(v)

    A = "audio_branch."
    has_fusion = any("fusion_model" in k or "mel_conv2d" in k for k in sd)

    def ln(key):
        return {"scale": jnp.asarray(sd[key + ".weight"]),
                "bias": jnp.asarray(sd[key + ".bias"])}

    conv_w = sd[A + "patch_embed.proj.weight"]  # [D, C, p, p]
    patch_w = conv_w.reshape(conv_w.shape[0], -1).T

    params: Params = {
        "bn0": {"scale": jnp.asarray(sd[A + "bn0.weight"]),
                "bias": jnp.asarray(sd[A + "bn0.bias"]),
                "mean": jnp.asarray(sd[A + "bn0.running_mean"]),
                "var": jnp.asarray(sd[A + "bn0.running_var"])},
        "patch_embed": {
            "proj": {"w": jnp.asarray(patch_w),
                     "b": jnp.asarray(sd[A + "patch_embed.proj.bias"])},
            "norm": ln(A + "patch_embed.norm"),
        },
        "stages": [],
        "norm": ln(A + "norm"),
        "audio_projection": {
            "fc1": {"w": jnp.asarray(sd["audio_projection.0.weight"].T),
                    "b": jnp.asarray(sd["audio_projection.0.bias"])},
            "fc2": {"w": jnp.asarray(sd["audio_projection.2.weight"].T),
                    "b": jnp.asarray(sd["audio_projection.2.bias"])},
        },
    }

    if has_fusion:
        # mel_conv2d: Conv2d(1, D, kernel (p, 3p), stride (p, 3p)).
        mc_w = sd[A + "patch_embed.mel_conv2d.weight"]  # [D, 1, p, 3p]
        params["patch_embed"]["mel_conv2d"] = {
            "w": jnp.asarray(mc_w.reshape(mc_w.shape[0], -1).T),
            "b": jnp.asarray(sd[A + "patch_embed.mel_conv2d.bias"]),
        }

        def conv1x1(key):  # Conv2d(cin, cout, 1) → channel-last linear
            w = sd[key + ".weight"]  # [cout, cin, 1, 1]
            return {"w": jnp.asarray(w[:, :, 0, 0].T),
                    "b": jnp.asarray(sd[key + ".bias"])}

        def bn(key):
            return {"scale": jnp.asarray(sd[key + ".weight"]),
                    "bias": jnp.asarray(sd[key + ".bias"]),
                    "mean": jnp.asarray(sd[key + ".running_mean"]),
                    "var": jnp.asarray(sd[key + ".running_var"])}

        F = A + "patch_embed.fusion_model."
        # AFF Sequential indices: local_att = [Conv, BN, ReLU, Conv, BN],
        # global_att = [AvgPool, Conv, BN, ReLU, Conv, BN].
        params["patch_embed"]["fusion"] = {
            "local": {"conv1": conv1x1(F + "local_att.0"), "bn1": bn(F + "local_att.1"),
                      "conv2": conv1x1(F + "local_att.3"), "bn2": bn(F + "local_att.4")},
            "global": {"conv1": conv1x1(F + "global_att.1"), "bn1": bn(F + "global_att.2"),
                       "conv2": conv1x1(F + "global_att.4"), "bn2": bn(F + "global_att.5")},
        }

    for s in range(len(cfg.depths)):
        prefix = f"{A}layers.{s}."
        blocks = []
        for j in range(cfg.depths[s]):
            bp = f"{prefix}blocks.{j}."
            blocks.append({
                "norm1": ln(bp + "norm1"),
                "attn": {
                    "qkv": {"w": jnp.asarray(sd[bp + "attn.qkv.weight"].T),
                            "b": jnp.asarray(sd[bp + "attn.qkv.bias"])},
                    "proj": {"w": jnp.asarray(sd[bp + "attn.proj.weight"].T),
                             "b": jnp.asarray(sd[bp + "attn.proj.bias"])},
                    "rel_bias": jnp.asarray(sd[bp + "attn.relative_position_bias_table"]),
                },
                "norm2": ln(bp + "norm2"),
                "mlp": {
                    "fc1": {"w": jnp.asarray(sd[bp + "mlp.fc1.weight"].T),
                            "b": jnp.asarray(sd[bp + "mlp.fc1.bias"])},
                    "fc2": {"w": jnp.asarray(sd[bp + "mlp.fc2.weight"].T),
                            "b": jnp.asarray(sd[bp + "mlp.fc2.bias"])},
                },
            })
        stage: Params = {"blocks": blocks}
        if s < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": ln(prefix + "downsample.norm"),
                "reduction": {"w": jnp.asarray(sd[prefix + "downsample.reduction.weight"].T)},
            }
        params["stages"].append(stage)
    return params


def load_clap(variant: str = "HTSAT-tiny", checkpoint_path: Optional[str] = None):
    """Resolve CLAP weights: local laion_clap checkpoint → random init.

    Returns ``(audio_params, audio_config, text)`` where ``text`` is
    ``(text_params, RobertaConfig)`` (the rerank tower) or a random tiny one
    when no checkpoint provides it.
    """
    import os

    cfg = get_htsat_config(variant)
    if cfg.name == "test-tiny":
        return init_htsat(cfg), cfg, init_clap_text(cfg.embedding_dim)

    candidates = [checkpoint_path, os.environ.get("CLIPCAP_CLAP_CHECKPOINT")]
    for cand in candidates:
        if cand and os.path.exists(cand):
            import torch

            ckpt = torch.load(cand, map_location="cpu", weights_only=False)
            sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
            text = clap_text_params_from_laion_clap(sd)
            if text is None:
                text = init_clap_text(cfg.embedding_dim)
            params = htsat_params_from_laion_clap(sd, cfg)
            if "mel_conv2d" in params["patch_embed"]:
                cfg = dataclasses.replace(cfg, enable_fusion=True)
            return params, cfg, text

    import warnings

    warnings.warn(
        f"No CLAP checkpoint found for '{variant}' (set "
        "CLIPCAP_CLAP_CHECKPOINT). Using RANDOM weights — fine for smoke "
        "tests, wrong for real audio captioning."
    )
    return init_htsat(cfg), cfg, init_clap_text(cfg.embedding_dim)


# ---------------------------------------------------------------------------
# CLAP text tower: RoBERTa + 2-layer projection into the joint space
# (laion_clap's text branch; enables the audio demo/eval rerank the
# reference intended at demo.py:47-66).
# ---------------------------------------------------------------------------


def clap_text_embedding(text_params, roberta_cfg, input_ids, attention_mask=None,
                        *, dtype=jnp.float32, precision=None):
    """RoBERTa pooler_output → text_projection MLP → [B, embed] (unnormalized,
    matching laion_clap's get_text_embedding before F.normalize)."""
    from clipcap_tpu.models.roberta import roberta_apply

    _, pooled = roberta_apply(text_params["roberta"], roberta_cfg, input_ids,
                              attention_mask, dtype=dtype, precision=precision)
    proj = text_params["projection"]
    h = linear(pooled, proj["fc1"]["w"], proj["fc1"]["b"], precision)
    h = jax.nn.relu(h)
    return linear(h, proj["fc2"]["w"], proj["fc2"]["b"], precision)


def clap_text_params_from_laion_clap(state_dict):
    """Import the text branch from a laion_clap checkpoint
    (``text_branch.*`` RoBERTa + ``text_projection.{0,2}.*`` MLP).
    Returns ``(text_params, RobertaConfig)`` or ``None`` if absent."""
    from clipcap_tpu.models.roberta import RobertaConfig, roberta_params_from_hf

    sd = {k.replace("module.", "", 1): v for k, v in state_dict.items()}
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v
          for k, v in sd.items()}
    if not any(k.startswith("text_branch.") for k in sd):
        return None

    def _np(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                          dtype=np.float32)

    emb = _np(sd["text_branch.embeddings.word_embeddings.weight"])
    pos = _np(sd["text_branch.embeddings.position_embeddings.weight"])
    n_layers = max(int(k.split(".")[3]) for k in sd
                   if k.startswith("text_branch.encoder.layer.")) + 1
    hidden = emb.shape[1]
    inter = _np(sd["text_branch.encoder.layer.0.intermediate.dense.weight"]).shape[0]
    heads = 12 if hidden % 12 == 0 else 8
    cfg = RobertaConfig(vocab_size=emb.shape[0], hidden_size=hidden,
                        num_layers=n_layers, num_heads=heads,
                        intermediate_size=inter,
                        max_position_embeddings=pos.shape[0])
    roberta = roberta_params_from_hf(sd, cfg, prefix="text_branch.")
    text_params = {
        "roberta": roberta,
        "projection": {
            "fc1": {"w": jnp.asarray(_np(sd["text_projection.0.weight"]).T),
                    "b": jnp.asarray(_np(sd["text_projection.0.bias"]))},
            "fc2": {"w": jnp.asarray(_np(sd["text_projection.2.weight"]).T),
                    "b": jnp.asarray(_np(sd["text_projection.2.bias"]))},
        },
    }
    return text_params, cfg


def init_clap_text(embed_dim: int = 512, seed: int = 7):
    """Random tiny text tower (offline smoke / test-tiny preset)."""
    from clipcap_tpu.models.roberta import RobertaConfig, init_roberta

    cfg = RobertaConfig(vocab_size=1024, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=80, name="roberta-test")
    rng = np.random.default_rng(seed)
    text_params = {
        "roberta": init_roberta(cfg, seed=seed),
        "projection": {
            "fc1": {"w": jnp.asarray(rng.normal(0, 0.02, (64, embed_dim)).astype(np.float32)),
                    "b": jnp.zeros((embed_dim,), jnp.float32)},
            "fc2": {"w": jnp.asarray(rng.normal(0, 0.02, (embed_dim, embed_dim)).astype(np.float32)),
                    "b": jnp.zeros((embed_dim,), jnp.float32)},
        },
    }
    return text_params, cfg
