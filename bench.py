"""Headline benchmark: beam-5 captions/sec/chip on the flagship decode path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): >= 50 beam-5 captions/sec/chip on the
transformer-mapper + GPT-2 config.  Runs on whatever backend jax resolves
(the driver runs it on one real TPU chip).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CAPTIONS_PER_SEC = 50.0  # BASELINE.json north_star, beam-5 per chip


def main() -> None:
    from clipcap_tpu.config import Config, EncoderConfig
    from clipcap_tpu.inference.beam import BeamParams, beam_search
    from clipcap_tpu.models.clipcap import build_mapper_config
    from clipcap_tpu.models.gpt2 import get_gpt2_config, init_gpt2
    from clipcap_tpu.models.mapper import init_mapper, mapper_apply

    lm_cfg = get_gpt2_config("gpt2")
    config = Config(language_model="gpt2", prefix_length=10, projection_length=10,
                    transformer_layers=8, transformer_attention_heads=8,
                    encoder_config=EncoderConfig(encoder_embedding_size=512))
    mapper_cfg = build_mapper_config(config, lm_cfg.n_embd)
    lm_params = init_gpt2(lm_cfg, seed=0)
    mapper_params = init_mapper(mapper_cfg, seed=0)

    rng = np.random.default_rng(0)
    n_samples = 16
    embeddings = jnp.asarray(rng.normal(size=(n_samples, 512)), jnp.float32)

    bp = BeamParams(beam_size=5, max_new_tokens=67, temperature=1.0,
                    stop_token=50256)

    def caption_one(emb):
        prefix = mapper_apply(mapper_params, mapper_cfg, emb[None], dtype=jnp.bfloat16)
        return beam_search(lm_params, lm_cfg, prefix, bp, dtype=jnp.bfloat16)

    # Warmup / compile.
    r = caption_one(embeddings[0])
    jax.block_until_ready(r.tokens)

    t0 = time.perf_counter()
    for i in range(n_samples):
        r = caption_one(embeddings[i])
    jax.block_until_ready(r.tokens)
    dt = time.perf_counter() - t0

    captions_per_sec = n_samples / dt
    print(json.dumps({
        "metric": "beam5_captions_per_sec_per_chip",
        "value": round(captions_per_sec, 3),
        "unit": "captions/s",
        "vs_baseline": round(captions_per_sec / BASELINE_CAPTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
