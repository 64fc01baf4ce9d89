"""Full-finetune train-step throughput at flagship scale (gpt2-large)."""
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

from clipcap_tpu.config import Config, EncoderConfig
from clipcap_tpu.models.clipcap import ClipCapModel, build_mapper_config
from clipcap_tpu.models.gpt2 import get_gpt2_config, init_gpt2
from clipcap_tpu.models.mapper import init_mapper
from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
from clipcap_tpu.train.state import create_train_state, make_optimizer
from clipcap_tpu.train.step import make_train_step

LM = sys.argv[1] if len(sys.argv) > 1 else "gpt2-large"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
T = 64

lm_cfg = get_gpt2_config(LM)
config = Config(language_model=LM, train_language_model=True,
                prefix_length=10, projection_length=10,
                transformer_layers=8, transformer_attention_heads=8,
                encoder_config=EncoderConfig(encoder_embedding_size=512))
mapper_cfg = build_mapper_config(config, lm_cfg.n_embd)
params = {"mapper": init_mapper(mapper_cfg, seed=0), "lm": init_gpt2(lm_cfg, seed=0)}
model = ClipCapModel(config=config, lm_config=lm_cfg, mapper_config=mapper_cfg,
                     params=params)

tx = make_optimizer(lr=2e-5, warmup_steps=10, total_steps=1000,
                    train_language_model=True)
state = create_train_state(model.params, tx)
mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
step_fn, state = make_train_step(
    mesh, state, tx, lm_cfg, mapper_cfg,
    prefix_length=config.prefix_length, dtype=jnp.bfloat16,
    remat=True, zero1=True,
)

rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(1, lm_cfg.vocab_size, size=(B, T)), jnp.int32)
embeds = jnp.asarray(rng.normal(size=(B, 512)), jnp.float32)

t0 = time.perf_counter()
state, metrics = step_fn(state, tokens, embeds)
print(f"compile+step: {time.perf_counter()-t0:.1f}s loss={float(metrics['loss']):.4f}", flush=True)

for trial in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = step_fn(state, tokens, embeds)
    float(metrics["loss"])  # sync
    dt = time.perf_counter() - t0
    print(f"{LM} B={B} trial {trial}: {5*B/dt:.1f} samples/s ({dt/5*1000:.0f} ms/step)", flush=True)
