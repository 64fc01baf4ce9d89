"""ViT-B/32 forward ablation: where does the embed-batch wall-clock go?

Usage: python benchmarks/ablate_vit.py [batch] [mode ...]

Modes:
  full     — the shipping clip_encode_image (baseline)
  patch    — patch embed + pos embed only (no transformer)
  nomlp    — blocks with the MLP branch removed
  noattn   — blocks with the attention branch removed
  softb16  — softmax in bf16 instead of fp32 (numerics probe, NOT exact)
  lastcls  — EXACT: the final block computes only the class-token row
             (its q is 1 token; every other token's output is discarded
             by ``x[:, 0]`` anyway) — candidate default if it wins

Methodology as docs/performance.md: warm compile, distinct pre-staged
uint8 batches, device->host scalar fetch sync, best of 3.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from clipcap_tpu.models.clip_vit import (_clip_block, clip_encode_image,
                                         get_clip_config, init_clip, patchify)
from clipcap_tpu.ops.layers import layer_norm, linear, quick_gelu

CFG = get_clip_config("ViT-B/32")
DT = jnp.bfloat16


def _embed_patches(params, images):
    """patch embed + cls + pos + ln_pre (mirrors clip_encode_image's fold)."""
    from clipcap_tpu.models.clip_vit import IMAGE_MEAN, IMAGE_STD

    cfg = CFG.vision
    x = images.astype(DT)
    pp = cfg.patch_size * cfg.patch_size
    mean_p = jnp.repeat(jnp.asarray(IMAGE_MEAN, jnp.float32), pp)
    std_p = jnp.repeat(jnp.asarray(IMAGE_STD, jnp.float32), pp)
    scale_p = (1.0 / std_p) / 255.0
    w0 = params["patch_embed"]["w"]
    w = (w0.astype(jnp.float32) * scale_p[:, None]).astype(DT)
    bias0 = (-(mean_p / std_p) @ w0.astype(jnp.float32)).astype(DT)
    x = patchify(x, cfg.patch_size)
    x = linear(x, w, bias0, None)
    B = x.shape[0]
    cls = jnp.broadcast_to(params["class_embedding"].astype(DT)[None, None],
                           (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(DT)[None]
    return layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])


def _block_ablated(x, layer, *, attn: bool, mlp: bool):
    cfg = CFG.vision
    heads, D = cfg.heads, cfg.width
    B, N, _ = x.shape
    Dh = D // heads
    if attn:
        from clipcap_tpu.ops.attention import sdpa

        h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], 1e-5)
        qkv = linear(h, layer["attn"]["in_proj"]["w"], layer["attn"]["in_proj"]["b"], None)
        q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
        a = sdpa(q, k, v, fused=False).reshape(B, N, D)
        x = x + linear(a, layer["attn"]["out_proj"]["w"], layer["attn"]["out_proj"]["b"], None)
    if mlp:
        h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], 1e-5)
        h = linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], None)
        x = x + linear(quick_gelu(h), layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], None)
    return x


def _final_block_cls_only(x, layer):
    """Exact last block restricted to the class-token output row."""
    cfg = CFG.vision
    heads, D = cfg.heads, cfg.width
    B, N, _ = x.shape
    Dh = D // heads
    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], 1e-5)
    qkv = linear(h, layer["attn"]["in_proj"]["w"], layer["attn"]["in_proj"]["b"], None)
    q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
    q0 = q[:, :1]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q0, k) * (Dh ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    a = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(B, 1, D)
    x0 = x[:, :1] + linear(a, layer["attn"]["out_proj"]["w"],
                           layer["attn"]["out_proj"]["b"], None)
    h = layer_norm(x0, layer["ln_2"]["scale"], layer["ln_2"]["bias"], 1e-5)
    h = linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], None)
    x0 = x0 + linear(quick_gelu(h), layer["mlp"]["c_proj"]["w"],
                     layer["mlp"]["c_proj"]["b"], None)
    return x0[:, 0]


def build(mode: str, params):
    vp = params["visual"]

    if mode == "full":
        return jax.jit(lambda x: clip_encode_image(vp, CFG.vision, x, dtype=DT))
    if mode == "patch":
        return jax.jit(lambda x: _embed_patches(vp, x)[:, 0])

    def fwd(x, *, attn=True, mlp=True, last_cls=False):
        h = _embed_patches(vp, x)
        blocks = vp["blocks"]
        if last_cls:
            body = jax.tree_util.tree_map(lambda p: p[:-1], blocks)
            last = jax.tree_util.tree_map(lambda p: p[-1], blocks)
        else:
            body, last = blocks, None
        h, _ = jax.lax.scan(
            lambda c, l: (_block_ablated(c, l, attn=attn, mlp=mlp), None),
            h, body)
        h = _final_block_cls_only(h, last) if last_cls else h[:, 0]
        h = layer_norm(h, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
        return jnp.dot(h, vp["proj"].astype(h.dtype))

    if mode == "nomlp":
        return jax.jit(partial(fwd, mlp=False))
    if mode == "noattn":
        return jax.jit(partial(fwd, attn=False))
    if mode == "lastcls":
        return jax.jit(partial(fwd, last_cls=True))
    if mode == "softb16":
        import clipcap_tpu.ops.attention as attn_mod

        orig = jnp.float32

        def fwd16(x):
            h = _embed_patches(vp, x)
            heads, D = CFG.vision.heads, CFG.vision.width

            def blk(c, layer):
                B, N, _ = c.shape
                Dh = D // heads
                hh = layer_norm(c, layer["ln_1"]["scale"], layer["ln_1"]["bias"], 1e-5)
                qkv = linear(hh, layer["attn"]["in_proj"]["w"], layer["attn"]["in_proj"]["b"], None)
                q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
                lg = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (Dh ** -0.5)
                w = jax.nn.softmax(lg, -1)  # bf16 softmax
                a = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(B, N, D)
                c = c + linear(a, layer["attn"]["out_proj"]["w"], layer["attn"]["out_proj"]["b"], None)
                hh = layer_norm(c, layer["ln_2"]["scale"], layer["ln_2"]["bias"], 1e-5)
                hh = linear(hh, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], None)
                return c + linear(quick_gelu(hh), layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], None)

            h, _ = jax.lax.scan(lambda c, l: (blk(c, l), None), h, vp["blocks"])
            h = layer_norm(h[:, 0], vp["ln_post"]["scale"], vp["ln_post"]["bias"])
            return jnp.dot(h, vp["proj"].astype(h.dtype))

        del attn_mod, orig
        return jax.jit(fwd16)
    raise SystemExit(f"unknown mode {mode}")


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 512
    modes = [a for a in args if not a.isdigit()] or [
        "full", "patch", "noattn", "nomlp", "lastcls", "softb16"]

    params = jax.tree_util.tree_map(lambda p: p.astype(DT),
                                    init_clip(CFG, seed=0))
    size = CFG.vision.image_size
    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(0, 256, (batch, size, size, 3),
                                           dtype=np.uint8)) for _ in range(4)]

    # exactness check for lastcls vs full (random weights, tight fp32-ish)
    if "lastcls" in modes:
        f_full, f_last = build("full", params), build("lastcls", params)
        a = np.asarray(f_full(batches[0][:8]), np.float32)
        b = np.asarray(f_last(batches[0][:8]), np.float32)
        print(f"lastcls max |delta| vs full: {float(np.abs(a - b).max()):.3e}",
              flush=True)

    for mode in modes:
        fwd = build(mode, params)
        for x in batches[:2]:
            float(jnp.sum(fwd(x)[:, :1]))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for x in batches:
                r = fwd(x)
            float(jnp.sum(r[:, :1]))
            dt = time.perf_counter() - t0
            best = max(best, batch * 4 / dt)
        print(f"{mode:8s} b{batch}: {best:8.0f} embeds/s "
              f"({batch * 4 / best * 1000 / 4:.2f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
