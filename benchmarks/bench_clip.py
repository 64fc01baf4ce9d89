"""ViT image-embedding throughput sweep (the second north star: >= 10k
ViT-B/32 embeds/s/chip, BASELINE.json).

Usage: python benchmarks/bench_clip.py [variant] [batch ...] [int8]
Defaults: ViT-B/32 over batches 256 512 1024.  ``int8`` switches the block
projections to the w8a8 path (--int8-encoder) and also prints the
embedding fidelity (cosine vs the bf16 path) of the first batch.

Measures the same jitted forward the preprocess pipeline runs
(``clip_encode_image`` in bf16), with the production input contract:
pre-staged DISTINCT uint8 HWC batches per round (the CLIP transform emits
uint8; normalization and /255 are folded into the patch-embed weights, so
uint8 is the honest device-side input dtype — see encoders/clip.py).
Pre-staging distinct batches guards against dispatch coalescing without
adding an elementwise pass to the measured program.

Methodology per docs/performance.md: warm compile, device->host scalar
fetch to synchronize (block_until_ready is a no-op over the tunnel),
best of 3 trials with the spread printed.
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

from clipcap_tpu.models.clip_vit import clip_encode_image, get_clip_config, init_clip

ROUNDS = 4
TRIALS = 3


def measure(variant: str, batch: int, rounds: int = ROUNDS,
            trials: int = TRIALS, int8: bool = False) -> tuple[float, list[float]]:
    cfg = get_clip_config(variant)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), init_clip(cfg, seed=0))
    size = cfg.vision.image_size
    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(rng.integers(0, 256, size=(batch, size, size, 3),
                                    dtype=np.uint8))
        for _ in range(rounds)
    ]

    vparams = params["visual"]
    if int8:
        from clipcap_tpu.ops.quant import quantize_clip_visual_int8

        qparams = jax.device_put(quantize_clip_visual_int8(vparams))
        fwd_bf16 = jax.jit(lambda p, x: clip_encode_image(
            p, cfg.vision, x, dtype=jnp.bfloat16))
        fwd = jax.jit(lambda p, x: clip_encode_image(
            p, cfg.vision, x, dtype=jnp.bfloat16, int8_acts=True))
        a = np.asarray(fwd_bf16(vparams, batches[0]), np.float32)
        b = np.asarray(fwd(qparams, batches[0]), np.float32)
        cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                 * np.linalg.norm(b, axis=-1) + 1e-9)
        print(f"  int8 fidelity: cos min {cos.min():.5f} mean {cos.mean():.5f}",
              file=sys.stderr)
        vparams = qparams
    else:
        fwd = jax.jit(lambda p, x: clip_encode_image(p, cfg.vision, x,
                                                     dtype=jnp.bfloat16))
    params = vparams
    float(jnp.sum(fwd(params, batches[0])[:, :1]))  # warmup/compile + sync

    per_trial = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for x in batches:
            r = fwd(params, x)
        float(jnp.sum(r[:, :1]))
        dt = time.perf_counter() - t0
        eps = batch * rounds / dt
        per_trial.append(round(eps, 1))
        print(f"  {variant} b{batch} trial: {eps:.0f} embeds/s",
              file=sys.stderr)
    return max(per_trial), per_trial


def main() -> None:
    args = sys.argv[1:]
    int8 = "int8" in args
    args = [a for a in args if a != "int8"]
    variant = args[0] if args and not args[0].isdigit() else "ViT-B/32"
    batches = [int(a) for a in args if a.isdigit()] or [256, 512, 1024]
    for b in batches:
        best, per_trial = measure(variant, b, int8=int8)
        tag = " (int8)" if int8 else ""
        print(f"{variant}{tag} batch {b}: best {best:.0f} embeds/s  trials={per_trial}")


if __name__ == "__main__":
    main()
