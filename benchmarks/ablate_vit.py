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
  nhm      — EXACT: scores as bnhd,bmhd->bnhm (token-major, no head-major
             relayout of q/k/v) + value product back to bnhd
  dpa      — EXACT: jax.nn.dot_product_attention(implementation='xla')
  noexpmax — softmax without the row-max pass (static shift; exact while
             |logits| stays in fp32 exp range — checked vs full)
  padn64   — EXACT: pad tokens 50->64 after patch embed with -1e9 key
             bias so every attention shape is lane/sublane aligned
  combo    — lastcls + the nhm score order (candidate shipping form)

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

from clipcap_tpu.models.clip_vit import (IMAGE_MEAN, IMAGE_STD, _clip_block,
                                         clip_encode_image, get_clip_config,
                                         init_clip, patchify)
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


def _embed_patches_variant(params, images, *, how: str):
    """Patch-embed stage with the patchify/convert order or algorithm
    swapped (the stage costs ~6.6 ms at b512 against ~2 ms of explained
    work — these modes bisect where the slack is):

    * u8patch — patchify (reshape/transpose) in uint8 FIRST, astype after:
      halves the bytes moved by the 6-d transpose vs transposing bf16.
    * conv — lax.conv_general_dilated stride-P on the bf16 NHWC input;
      XLA's dedicated conv lowering picks its own im2col strategy.
    """
    cfg = CFG.vision
    P = cfg.patch_size
    pp = P * P
    mean_p = jnp.repeat(jnp.asarray(IMAGE_MEAN, jnp.float32), pp)
    std_p = jnp.repeat(jnp.asarray(IMAGE_STD, jnp.float32), pp)
    scale_p = (1.0 / std_p) / 255.0
    w0 = params["patch_embed"]["w"]
    w = (w0.astype(jnp.float32) * scale_p[:, None]).astype(DT)
    bias0 = (-(mean_p / std_p) @ w0.astype(jnp.float32)).astype(DT)
    if how == "u8patch":
        x = patchify(images, P).astype(DT)
        x = linear(x, w, bias0, None)
    elif how == "conv":
        # shipping weight rows are (c, ph, pw); conv HWIO wants [P, P, 3, D]
        kern = jnp.transpose(w.reshape(3, P, P, -1), (1, 2, 0, 3))
        y = jax.lax.conv_general_dilated(
            images.astype(DT), kern, window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        B = y.shape[0]
        x = y.reshape(B, -1, cfg.width) + bias0
    else:
        raise ValueError(how)
    B = x.shape[0]
    cls = jnp.broadcast_to(params["class_embedding"].astype(DT)[None, None],
                           (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(DT)[None]
    return layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])


def _embed_patches_flat(params, images_flat):
    """Patch embed from [B, H, W·C] uint8 input (flat-staged ingest
    candidate: same bytes as HWC, reshaped for free on the host before
    device_put so the device never sees a 3-wide minor dim).  Patchify is
    a reshape/transpose over (P, P·C) blocks; weight rows are permuted
    once at fold time from the shipping (c, ph, pw) order to this path's
    (ph, pw, c) order, so the matmul output is bit-identical."""
    cfg = CFG.vision
    P = cfg.patch_size
    x = images_flat.astype(DT)
    B, H, WC = x.shape
    gh, gw = H // P, WC // (P * 3)
    x = x.reshape(B, gh, P, gw, P * 3)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, gh * gw, P * P * 3)

    pp = P * P
    mean = np.asarray(IMAGE_MEAN, np.float32)
    std = np.asarray(IMAGE_STD, np.float32)
    # (ph, pw, c) row order: channel varies fastest along the patch vector
    scale_p = jnp.asarray(np.tile(1.0 / std / 255.0, pp), jnp.float32)
    idx = np.arange(pp * 3)
    ph, rem = idx // (P * 3), idx % (P * 3)
    pw, c = rem // 3, rem % 3
    perm = c * pp + ph * P + pw          # flat row r holds shipping row perm[r]
    w0 = params["patch_embed"]["w"]
    w = (w0.astype(jnp.float32)[jnp.asarray(perm)] * scale_p[:, None]).astype(DT)
    bias0 = (-(jnp.repeat(jnp.asarray(mean / std), pp))
             @ w0.astype(jnp.float32)).astype(DT)
    x = linear(x, w, bias0, None)
    cls = jnp.broadcast_to(params["class_embedding"].astype(DT)[None, None],
                           (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(DT)[None]
    return layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])


def _block_qkvpal(x, layer):
    """Block with the attention middle in the packed-qkv Pallas kernel."""
    from clipcap_tpu.ops.attention import sdpa_packed

    cfg = CFG.vision
    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], 1e-5)
    qkv = linear(h, layer["attn"]["in_proj"]["w"], layer["attn"]["in_proj"]["b"], None)
    a = sdpa_packed(qkv, cfg.heads)
    x = x + linear(a, layer["attn"]["out_proj"]["w"], layer["attn"]["out_proj"]["b"], None)
    h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], 1e-5)
    h = linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], None)
    return x + linear(quick_gelu(h), layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], None)


def _attn_middle(q, k, v, *, impl: str, bias=None):
    """The scores->softmax->value middle, q/k/v as [B, N, h, Dh]."""
    B, N, h, Dh = q.shape
    s = Dh ** -0.5
    if impl == "dpa":
        return jax.nn.dot_product_attention(
            q, k, v, bias=bias, scale=s, implementation="xla")
    if impl == "nhm":
        logits = (jnp.einsum("bnhd,bmhd->bnhm", q, k) * s).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias  # bias broadcast [1, 1, 1, M]
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bnhm,bmhd->bnhd", w, v)
    logits = (jnp.einsum("bnhd,bmhd->bhnm", q, k) * s).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    if impl == "noexpmax":
        # softmax(x) == exp(x - C) / sum(exp(x - C)) for any static C; with
        # C = 20 this skips the row-max reduction pass and is exact in fp32
        # while logits stay within (-67, 107) — checked vs full below.
        e = jnp.exp(logits - 20.0)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    else:
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", w, v)


def _block_impl(x, layer, *, impl: str, bias=None):
    cfg = CFG.vision
    heads, D = cfg.heads, cfg.width
    B, N, _ = x.shape
    Dh = D // heads
    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], 1e-5)
    qkv = linear(h, layer["attn"]["in_proj"]["w"], layer["attn"]["in_proj"]["b"], None)
    q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
    a = _attn_middle(q, k, v, impl=impl, bias=bias).reshape(B, N, D)
    x = x + linear(a, layer["attn"]["out_proj"]["w"], layer["attn"]["out_proj"]["b"], None)
    h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], 1e-5)
    h = linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], None)
    return x + linear(quick_gelu(h), layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], None)


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

    if mode == "flatpatch":
        return jax.jit(lambda x: _embed_patches_flat(vp, x)[:, 0])

    if mode in ("flatin", "flatcombo"):
        last_cls = mode == "flatcombo"
        impl = "nhm" if mode == "flatcombo" else "bhnm"

        def fwdf(x):
            h = _embed_patches_flat(vp, x)
            blocks = vp["blocks"]
            if last_cls:
                body = jax.tree_util.tree_map(lambda p: p[:-1], blocks)
                last = jax.tree_util.tree_map(lambda p: p[-1], blocks)
            else:
                body, last = blocks, None
            h, _ = jax.lax.scan(
                lambda c, l: (_block_impl(c, l, impl=impl), None), h, body)
            h = _final_block_cls_only(h, last) if last_cls else h[:, 0]
            h = layer_norm(h, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
            return jnp.dot(h, vp["proj"].astype(h.dtype))

        return jax.jit(fwdf)

    if mode in ("qkvpal", "qkvcombo", "flatqkv", "qkvu8", "qkvconv"):
        last_cls = mode != "qkvpal"
        embed = {
            "flatqkv": _embed_patches_flat,
            "qkvu8": partial(_embed_patches_variant, how="u8patch"),
            "qkvconv": partial(_embed_patches_variant, how="conv"),
        }.get(mode, _embed_patches)

        def fwd3(x):
            h = embed(vp, x)
            blocks = vp["blocks"]
            if last_cls:
                body = jax.tree_util.tree_map(lambda p: p[:-1], blocks)
                last = jax.tree_util.tree_map(lambda p: p[-1], blocks)
            else:
                body, last = blocks, None
            h, _ = jax.lax.scan(
                lambda c, l: (_block_qkvpal(c, l), None), h, body)
            h = _final_block_cls_only(h, last) if last_cls else h[:, 0]
            h = layer_norm(h, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
            return jnp.dot(h, vp["proj"].astype(h.dtype))

        return jax.jit(fwd3)

    if mode in ("nhm", "dpa", "noexpmax", "padn64", "combo"):
        impl = {"combo": "nhm", "padn64": "bhnm"}.get(mode, mode)
        pad = mode == "padn64"
        last_cls = mode == "combo"

        def fwd2(x):
            h = _embed_patches(vp, x)
            bias = None
            if pad:
                B, N, D = h.shape
                h = jnp.pad(h, ((0, 0), (0, 64 - N), (0, 0)))
                kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 64), 3)
                bias = jnp.where(kpos < N, 0.0, -1e9).astype(jnp.float32)
            blocks = vp["blocks"]
            if last_cls:
                body = jax.tree_util.tree_map(lambda p: p[:-1], blocks)
                last = jax.tree_util.tree_map(lambda p: p[-1], blocks)
            else:
                body, last = blocks, None
            h, _ = jax.lax.scan(
                lambda c, l: (_block_impl(c, l, impl=impl, bias=bias), None),
                h, body)
            h = _final_block_cls_only(h, last) if last_cls else h[:, 0]
            h = layer_norm(h, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
            return jnp.dot(h, vp["proj"].astype(h.dtype))

        return jax.jit(fwd2)
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
    hosts = [rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
             for _ in range(4)]
    batches = [jax.device_put(h) for h in hosts]
    # flat staging: same bytes, host-side view — the device never sees the
    # 3-wide minor dim (candidate ingest contract, see _embed_patches_flat)
    flat_modes = {"flatpatch", "flatin", "flatcombo", "flatqkv"}
    flats = ([jax.device_put(h.reshape(batch, size, size * 3)) for h in hosts]
             if any(m in flat_modes for m in modes) else None)

    def inputs_for(mode):
        return flats if mode in flat_modes else batches

    # exactness checks vs full (random weights, tight fp32-ish)
    exact_modes = [m for m in modes
                   if m in ("lastcls", "nhm", "dpa", "noexpmax", "padn64",
                            "combo", "qkvpal", "qkvcombo", "flatin",
                            "flatcombo", "flatqkv", "qkvu8", "qkvconv")]
    if exact_modes:
        f_full = build("full", params)
        a = np.asarray(f_full(batches[0][:8]), np.float32)
        for m in exact_modes:
            xs = inputs_for(m)[0][:8]
            b = np.asarray(build(m, params)(xs), np.float32)
            print(f"{m} max |delta| vs full: {float(np.abs(a - b).max()):.3e}",
                  flush=True)

    for mode in modes:
        fwd = build(mode, params)
        xs = inputs_for(mode)
        for x in xs[:2]:
            float(jnp.sum(fwd(x)[:, :1]))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for x in xs:
                r = fwd(x)
            float(jnp.sum(r[:, :1]))
            dt = time.perf_counter() - t0
            best = max(best, batch * 4 / dt)
        print(f"{mode:8s} b{batch}: {best:8.0f} embeds/s "
              f"({batch * 4 / best * 1000 / 4:.2f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
