"""Patch-embed stage A/B: where do 6.9 ms go in the ViT-B/32 front end?

Usage: python benchmarks/ablate_patch.py [batch]

Forms (all produce [B, 49, 768] pre-cls patch embeddings):
  reshape  — shipping path: uint8→bf16 astype, 6-d reshape/transpose
             patchify, then one [B·49, 3072]×[3072, 768] matmul
  conv     — lax.conv_general_dilated stride-32 on NHWC uint8→bf16 input
             (XLA chooses its own layout lowering for the im2col)
  rowmajor — patchify with (ph, pw, c)-minor patch order (weight rows
             permuted once at fold time, outside the timed region) —
             tests whether the (c, ph, pw) inner transpose is the cost
  astype   — uint8→bf16 conversion alone (traffic floor probe)
  pallas   — the fused uint8-im2col+matmul kernel (ops/patch_embed.py,
             round 5): one pass, no bf16 pixel intermediate

Pass a variant name (e.g. ViT-L/14) as the first arg to switch geometry.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from clipcap_tpu.models.clip_vit import get_clip_config, init_clip, patchify
from clipcap_tpu.ops.layers import linear

_VARIANT = next((a for a in sys.argv[1:] if a.startswith(("ViT", "RN"))),
                "ViT-B/32")
CFG = get_clip_config(_VARIANT)
DT = jnp.bfloat16
P = CFG.vision.patch_size
D = CFG.vision.width


def build(mode: str, w):
    # w: [3·P·P, D] in the shipping (c, ph, pw) row order, bf16
    if mode == "astype":
        return jax.jit(lambda x: x.astype(DT))

    if mode == "reshape":
        return jax.jit(lambda x: linear(patchify(x.astype(DT), P), w, None, None))

    if mode == "conv":
        # conv kernel layout HWIO: [P, P, 3, D]; shipping rows are (c, ph, pw)
        # so invert: w[c*P*P + ph*P + pw, :] -> kern[ph, pw, c, :]
        kern = np.asarray(w, np.float32).reshape(3, P, P, D).transpose(1, 2, 0, 3)
        kern = jnp.asarray(kern, DT)

        def f(x):
            y = jax.lax.conv_general_dilated(
                x.astype(DT), kern, window_strides=(P, P), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            B = y.shape[0]
            return y.reshape(B, -1, D)

        return jax.jit(f)

    if mode == "astype672":
        # same bytes, staged as [B, H, W·3] (minor dim 672 tiles cleanly)
        return jax.jit(lambda x: x.astype(DT)), True

    if mode == "reshape672":
        def f(x):
            B, H, WC = x.shape
            x = x.reshape(B, H, WC // 3, 3)
            return linear(patchify(x.astype(DT), P), w, None, None)

        return jax.jit(f), True

    if mode == "pallas":
        from clipcap_tpu.ops.patch_embed import patch_embed_fused

        return jax.jit(lambda x: patch_embed_fused(x, w, None, P, out_dtype=DT))

    if mode == "rowmajor":
        # permute weight rows once so patch rows can stay (ph, pw, c)-minor:
        # row (ph*P + pw)*3 + c  <-  shipping row c*P*P + ph*P + pw
        idx = np.arange(3 * P * P).reshape(3, P, P).transpose(1, 2, 0).reshape(-1)
        w2 = jnp.asarray(np.asarray(w, np.float32)[idx], DT)

        def f(x):
            x = x.astype(DT)
            B, H, W, C = x.shape
            gh, gw = H // P, W // P
            x = x.reshape(B, gh, P, gw, P, C)
            x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, C]
            x = x.reshape(B, gh * gw, P * P * C)
            return linear(x, w2, None, None)

        return jax.jit(f)

    raise SystemExit(f"unknown mode {mode}")


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 512
    modes = [a for a in args
             if not a.isdigit() and not a.startswith(("ViT", "RN"))] or [
        "astype", "reshape", "conv", "rowmajor", "pallas"]

    params = jax.tree_util.tree_map(lambda p: p.astype(DT),
                                    init_clip(CFG, seed=0))
    w = params["visual"]["patch_embed"]["w"]
    size = CFG.vision.image_size
    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(0, 256, (batch, size, size, 3),
                                           dtype=np.uint8)) for _ in range(4)]

    flat_batches = [jax.device_put(np.asarray(x).reshape(batch, size, size * 3))
                    for x in batches]

    ref = None
    for mode in modes:
        built = build(mode, w)
        fwd, flat = built if isinstance(built, tuple) else (built, False)
        src = flat_batches if flat else batches
        out = np.asarray(fwd(src[0][:4]), np.float32)
        if mode == "reshape":
            ref = out
        elif ref is not None and out.shape == ref.shape:
            print(f"{mode}: max |delta| vs reshape {float(np.abs(out - ref).max()):.3e}",
                  flush=True)
        for x in src[:2]:
            float(jnp.sum(fwd(x).astype(jnp.float32).reshape(-1)[:1]))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for x in src:
                r = fwd(x)
            float(jnp.sum(r.astype(jnp.float32).reshape(-1)[:1]))
            dt = time.perf_counter() - t0
            best = max(best, batch * 4 / dt)
        print(f"{mode:9s} b{batch}: {best:8.0f} img/s ({batch * 4 / best * 250:.2f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    main()
