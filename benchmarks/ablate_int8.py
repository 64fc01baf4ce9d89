"""Is int8×int8→int32 actually ~2x bf16 on this chip, end to end?

TPU v5e's MXU runs int8 dots at twice the bf16 FLOP rate (394 TOPS vs
197 TFLOPS peak).  This ablation measures whether that materializes
through XLA for the ViT block shapes — including the dynamic per-token
activation-quantization overhead that a w8a8 layer actually pays
(``ops/quant.int8_linear``) — before we commit to a w8a8 ViT path.

Usage: python benchmarks/ablate_int8.py [M] [trials]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from clipcap_tpu.ops.quant import int8_linear, quantize_linear

M = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 50   # ViT-B/32 b512 token rows
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

rng = np.random.default_rng(0)
SHAPES = [("in_proj", 768, 2304), ("mlp_fc", 768, 3072), ("mlp_proj", 3072, 768)]


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[..., :1]).astype(jnp.float32))  # force via host fetch
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[..., :1]).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


for name, K, N in SHAPES:
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    wq = jax.device_put(quantize_linear(w))
    wb = w.astype(jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    qonly = jax.device_put(wq["q"])

    bf16 = jax.jit(lambda a, b: jnp.dot(a, b))
    w8a8 = jax.jit(lambda a, b: int8_linear(a, b))
    s8s8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))

    t_bf16 = timed(bf16, x, wb)
    t_w8a8 = timed(w8a8, x, wq)
    t_raw = timed(s8s8, xq, qonly)
    tflop = 2 * M * K * N / 1e12
    print(f"{name:8s} [{M}x{K}]x[{K}x{N}]  bf16 {t_bf16*1e3:7.3f} ms ({tflop/t_bf16:6.1f} TF/s)"
          f"  w8a8 {t_w8a8*1e3:7.3f} ms ({tflop/t_w8a8:6.1f} TF/s)"
          f"  raw-s8 {t_raw*1e3:7.3f} ms ({tflop/t_raw:6.1f} TF/s)", flush=True)
