"""Nucleus-sampling (eval-path) throughput with the dynamic flash kernel.

Prints TWO numbers per batch size:
* early-exit — the eval path as-is (stop token '.'-style ends rows early;
  with random weights most rows exit long before 67 tokens, inflating
  captions/s relative to the always-67-token beam numbers);
* forced-67 — stop token disabled, every row generates all 67 tokens
  (the length-comparable figure; VERDICT r2 weak #4);
* topk-mix — top-k 40 + top-p 0.9 + repetition penalty 1.2, forced 67
  tokens (the docs/performance.md "Top-k/top-p sampling" row).
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

from clipcap_tpu.inference.engine import SamplingParams, decode
from clipcap_tpu.models.gpt2 import get_gpt2_config, init_gpt2

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
cfg = get_gpt2_config("gpt2")
params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), init_gpt2(cfg, 0))
rng = np.random.default_rng(0)
prefix = jnp.asarray(rng.normal(size=(B, 10, cfg.n_embd)) * 0.02, jnp.bfloat16)
CONFIGS = (
    ("early-exit", SamplingParams(max_new_tokens=67, top_p=0.95, stop_token=50256)),
    ("forced-67", SamplingParams(max_new_tokens=67, top_p=0.95, stop_token=-1)),
    ("topk-mix", SamplingParams(max_new_tokens=67, top_k=40, top_p=0.9,
                                repetition_penalty=1.2, stop_token=-1)),
)
for label, sp in CONFIGS:
    t0 = time.perf_counter()
    res = decode(params, cfg, prefix, jax.random.PRNGKey(0), sp, dtype=jnp.bfloat16)
    print(f"{label} compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    float(jnp.sum(res.tokens[:, :1]))

    for trial in range(3):
        t0 = time.perf_counter()
        res = decode(params, cfg, prefix + trial * 1e-3, jax.random.PRNGKey(trial),
                     sp, dtype=jnp.bfloat16)
        float(jnp.sum(res.tokens[:, :1]))
        dt = time.perf_counter() - t0
        mean_len = float(jnp.mean(res.lengths))
        print(f"B={B} {label} trial {trial}: {B/dt:.1f} captions/s "
              f"(mean length {mean_len:.1f})", flush=True)
