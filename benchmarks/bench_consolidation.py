"""A/B the converged-prefix beam-cache consolidation on real hardware.

Sweeps the consolidation cadence C (0 = disabled) and the shared-phase
kernel knobs (CLIPCAP_FLASH_SHARED_TILE / CLIPCAP_FLASH_FUSED_ROWS are
trace-time env reads — flash_decode.py:626,648 — so they are set
per-variant before the first trace of that variant).

Usage: bench_consolidation.py [model] [R] [trials] [C ...]
  env CLIPCAP_FLASH_SHARED_TILE / CLIPCAP_FLASH_FUSED_ROWS per run.
"""
import os
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
from clipcap_tpu.models.gpt2 import get_gpt2_config, init_gpt2

MODEL = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 128
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
CADENCES = [int(c) for c in sys.argv[4:]] or [0, 8, 16, 32]

cfg = get_gpt2_config(MODEL)
params = jax.tree_util.tree_map(
    lambda p: jnp.asarray(p, jnp.bfloat16), init_gpt2(cfg, seed=0))
rng = np.random.default_rng(0)
prefix = jnp.asarray(rng.normal(size=(R, 10, cfg.n_embd)) * 0.02, jnp.bfloat16)

tile = os.environ.get("CLIPCAP_FLASH_SHARED_TILE", "32")
rows = os.environ.get("CLIPCAP_FLASH_FUSED_ROWS", "auto")
print(f"{MODEL} R={R} shared_tile={tile} fused_rows={rows}", flush=True)

for C in CADENCES:
    bp = BeamParams(beam_size=5, max_new_tokens=67, stop_token=50256,
                    consolidate_every=C)
    t0 = time.perf_counter()
    res = beam_search_batched(params, cfg, prefix, bp, dtype=jnp.bfloat16)
    float(jnp.sum(res.tokens[..., :1]))  # sync (includes compile)
    print(f"  C={C}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        res = beam_search_batched(params, cfg, prefix + trial * 1e-3, bp,
                                  dtype=jnp.bfloat16)
        float(jnp.sum(res.tokens[..., :1]))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"  C={C} trial {trial}: {dt*1000:.0f} ms -> "
              f"{R/dt:.1f} captions/s", flush=True)
    print(f"  C={C} best: {R/best:.1f} captions/s, "
          f"{best/67*1000:.2f} ms/step", flush=True)
