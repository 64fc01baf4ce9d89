"""CLAP (HTSAT-tiny) audio-embedding throughput."""
import os
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clipcap_tpu.models.htsat import HTSATConfig, clap_audio_embedding, init_htsat

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cfg = HTSATConfig()
params = init_htsat(cfg, seed=0)
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(B, 480000)) * 0.1, jnp.float32)  # 10 s @48k

fwd = jax.jit(lambda p, x: clap_audio_embedding(p, cfg, x, dtype=jnp.bfloat16))
t0 = time.perf_counter()
out = fwd(params, wav)
print(f"compile+run: {time.perf_counter()-t0:.1f}s shape={out.shape}", flush=True)
float(jnp.sum(out[:, :1]))

for trial in range(3):
    t0 = time.perf_counter()
    for i in range(5):
        out = fwd(params, wav + i * 1e-4)
    float(jnp.sum(out[:, :1]))
    dt = time.perf_counter() - t0
    print(f"B={B} trial {trial}: {5*B/dt:.1f} embeds/s", flush=True)
