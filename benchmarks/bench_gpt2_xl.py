"""GPT-2-family beam-5 throughput: R (batch), weight/cache residency modes.

Usage: bench_gpt2_xl.py [R] [trials] [int8|fp32|int8kv|tm|man|mantm] [model]

``tm`` = tile-major cache layout A/B (BeamParams.tile_major: one
contiguous HBM chunk per (row, u-tile) kernel read — token-identical,
tests whether the decode stream rate is descriptor-granularity bound).
``man`` = manual-pipeline kernel form (CLIPCAP_FLASH_MANUAL: in-kernel
tile loop, explicit double-buffered DMA — tests whether the rate is
auto-pipeline overhead).  ``mantm`` = both.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception as e:
    print(f"compilation cache unavailable: {e}", flush=True)

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
from clipcap_tpu.models.gpt2 import get_gpt2_config, init_gpt2

R = int(sys.argv[1]) if len(sys.argv) > 1 else 16
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
INT8 = len(sys.argv) > 3 and sys.argv[3] == "int8"
FP32 = len(sys.argv) > 3 and sys.argv[3] == "fp32"
INT8KV = len(sys.argv) > 3 and sys.argv[3] == "int8kv"
TM = len(sys.argv) > 3 and sys.argv[3] in ("tm", "mantm")
MAN = len(sys.argv) > 3 and sys.argv[3] in ("man", "mantm")
if MAN:
    __import__("os").environ["CLIPCAP_FLASH_MANUAL"] = "1"

MODEL = sys.argv[4] if len(sys.argv) > 4 else "gpt2-xl"
cfg = get_gpt2_config(MODEL)
params = init_gpt2(cfg, seed=0)
DT = jnp.float32 if FP32 else jnp.bfloat16
params = jax.tree_util.tree_map(lambda p: jnp.asarray(p, DT), params)
if INT8:
    from clipcap_tpu.ops.quant import quantize_gpt2_int8
    params = quantize_gpt2_int8(params)

rng = np.random.default_rng(0)
prefix = jnp.asarray(rng.normal(size=(R, 10, cfg.n_embd)) * 0.02, DT)
bp = BeamParams(beam_size=5, max_new_tokens=67, stop_token=50256, int8_kv=INT8KV,
                tile_major=TM or None)

t0 = time.perf_counter()
res = beam_search_batched(params, cfg, prefix, bp, dtype=DT)
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
float(jnp.sum(res.tokens[..., :1]))  # sync

best = float("inf")
for trial in range(TRIALS):
    t0 = time.perf_counter()
    res = beam_search_batched(params, cfg, prefix + trial * 1e-3, bp, dtype=DT)
    float(jnp.sum(res.tokens[..., :1]))
    dt = time.perf_counter() - t0
    print(f"{MODEL} R={R}{' int8' if INT8 else (' fp32' if FP32 else (' int8kv' if INT8KV else ((' man' if MAN else '') + (' tm' if TM else ''))))} trial {trial}: {dt*1000:.0f} ms -> {R/dt:.1f} captions/s", flush=True)
    best = min(best, dt)
print(f"{MODEL} R={R}{' int8' if INT8 else (' fp32' if FP32 else (' int8kv' if INT8KV else ((' man' if MAN else '') + (' tm' if TM else ''))))} best: {R/best:.1f} captions/s, {best/67*1000:.2f} ms/step", flush=True)
