"""Is int8×int8→int32 actually ~2x bf16 on this chip, end to end?

TPU v5e's MXU runs int8 dots at twice the bf16 FLOP rate (394 TOPS vs
197 TFLOPS peak).  This ablation measures whether that materializes
through XLA for the ViT block shapes — including the dynamic per-token
activation-quantization overhead that a w8a8 layer actually pays
(``ops/quant.int8_linear``) — before we commit to a w8a8 ViT path.

Each variant runs a CHAIN of ``ITERS`` dependent down/up matmul pairs
inside one jitted program (single-op programs measure the dispatch
round-trip over the tunnel, not the MXU: ~26 ms/call ≈ 3.5 "TF/s").

Usage: python benchmarks/ablate_int8.py [M] [iters] [trials]
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
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 24
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
D, F = 768, 3072

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
w_up = jnp.asarray(rng.normal(size=(D, F)).astype(np.float32) * 0.02)
w_dn = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32) * 0.02)
uq = jax.device_put(quantize_linear(w_up))
dq = jax.device_put(quantize_linear(w_dn))
ub, db = w_up.astype(jnp.bfloat16), w_dn.astype(jnp.bfloat16)

tflop_chain = ITERS * 2 * 2 * M * D * F / 1e12


@jax.jit
def chain_bf16(x):
    def body(i, y):
        h = jnp.dot(y, ub)
        return jnp.tanh(jnp.dot(h, db))  # tanh keeps values bounded, blocks CSE
    return jax.lax.fori_loop(0, ITERS, body, x)


@jax.jit
def chain_w8a8(x):
    def body(i, y):
        h = int8_linear(y, uq)
        return jnp.tanh(int8_linear(h, dq))
    return jax.lax.fori_loop(0, ITERS, body, x)


def timed(fn, x):
    out = fn(x)
    float(jnp.sum(out[..., :1]).astype(jnp.float32))  # warm + force
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        out = fn(x)
        float(jnp.sum(out[..., :1]).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


t_b = timed(chain_bf16, x0)
t_q = timed(chain_w8a8, x0)
print(f"chain of {ITERS} [{M}x{D}]x[{D}x{F}] up/down pairs:")
print(f"  bf16  {t_b*1e3:8.2f} ms  ({tflop_chain/t_b:6.1f} TF/s)")
print(f"  w8a8  {t_q*1e3:8.2f} ms  ({tflop_chain/t_q:6.1f} TF/s)  speedup x{t_b/t_q:.2f}")
