"""Weight import: HF / OpenAI / reference PyTorch checkpoints → JAX pytrees.

The reference loads pretrained towers straight from their upstream packages
(HF ``AutoModelForCausalLM`` at /root/reference/clipcap/model/model.py:19,
``clip.load`` at /root/reference/clipcap/encoders/clip.py:134).  This module
is the TPU-side equivalent: it converts those checkpoints' state dicts into
the layer-stacked pytrees our scan-based models consume.

Everything here is host-side, numpy-only (no torch required at runtime —
torch tensors are accepted and converted if passed).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from clipcap_tpu.models.gpt2 import GPT2Config, Params


def _to_np(x) -> np.ndarray:
    """Accept torch tensors, numpy arrays, or jax arrays."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pt``/``.bin`` torch state dict or ``.safetensors`` file."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd and all(
        not hasattr(v, "shape") for k, v in list(sd.items())[:1]
    ):
        sd = sd["state_dict"]
    return {k: _to_np(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# GPT-2
# ---------------------------------------------------------------------------


def gpt2_params_from_hf(state_dict: Mapping[str, Any], cfg: GPT2Config) -> Params:
    """Convert an HF ``GPT2LMHeadModel``/``GPT2Model`` state dict to our pytree.

    HF's ``Conv1D`` stores weights ``[in, out]`` — exactly our ``linear``
    layout, so the only structural change is stacking the per-layer tensors
    along a new leading axis for ``lax.scan``.
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()}

    # Tolerate both "transformer.x" (LMHeadModel) and bare "x" (GPT2Model) keys.
    def get(key: str) -> np.ndarray:
        for candidate in (f"transformer.{key}", key):
            if candidate in sd:
                return sd[candidate]
        raise KeyError(f"GPT-2 import: missing key '{key}' (have {len(sd)} keys)")

    L = cfg.n_layer

    def stack(fmt: str) -> jnp.ndarray:
        return jnp.asarray(np.stack([get(fmt.format(i)) for i in range(L)]).astype(np.float32))

    params: Params = {
        "wte": jnp.asarray(get("wte.weight").astype(np.float32)),
        "wpe": jnp.asarray(get("wpe.weight").astype(np.float32)),
        "h": {
            "ln_1": {"scale": stack("h.{}.ln_1.weight"), "bias": stack("h.{}.ln_1.bias")},
            "attn": {
                "c_attn": {"w": stack("h.{}.attn.c_attn.weight"), "b": stack("h.{}.attn.c_attn.bias")},
                "c_proj": {"w": stack("h.{}.attn.c_proj.weight"), "b": stack("h.{}.attn.c_proj.bias")},
            },
            "ln_2": {"scale": stack("h.{}.ln_2.weight"), "bias": stack("h.{}.ln_2.bias")},
            "mlp": {
                "c_fc": {"w": stack("h.{}.mlp.c_fc.weight"), "b": stack("h.{}.mlp.c_fc.bias")},
                "c_proj": {"w": stack("h.{}.mlp.c_proj.weight"), "b": stack("h.{}.mlp.c_proj.bias")},
            },
        },
        "ln_f": {"scale": jnp.asarray(get("ln_f.weight").astype(np.float32)),
                 "bias": jnp.asarray(get("ln_f.bias").astype(np.float32))},
    }

    assert params["wte"].shape == (cfg.vocab_size, cfg.n_embd), (
        f"vocab/embed mismatch: checkpoint {params['wte'].shape} vs config "
        f"({cfg.vocab_size}, {cfg.n_embd})"
    )
    return params


def gpt2_config_from_hf(hf_config) -> GPT2Config:
    """Build our config from a ``transformers.GPT2Config`` (object or dict)."""
    if not isinstance(hf_config, dict):
        hf_config = hf_config.to_dict()
    return GPT2Config(
        vocab_size=hf_config["vocab_size"],
        n_positions=hf_config["n_positions"],
        n_embd=hf_config["n_embd"],
        n_layer=hf_config["n_layer"],
        n_head=hf_config["n_head"],
        layer_norm_epsilon=hf_config.get("layer_norm_epsilon", 1e-5),
        activation="gelu_new",
        name=hf_config.get("_name_or_path", "gpt2-custom") or "gpt2-custom",
    )


def load_gpt2(name_or_path: str):
    """Resolve a GPT-2 by preset name / HF id / local path.

    Returns ``(params, config)``.  Tries, in order:
      1. a local directory with config.json + weights,
      2. the HF hub via ``transformers`` (works when the model is cached or
         the machine has network access),
      3. falls back to randomly-initialized weights for a known preset name
         (useful for benchmarking and offline smoke tests) with a warning.
    """
    from clipcap_tpu.models.gpt2 import GPT2_PRESETS, init_gpt2

    if os.path.isdir(name_or_path):
        import json

        with open(os.path.join(name_or_path, "config.json")) as f:
            cfg = gpt2_config_from_hf(json.load(f))
        for fname in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(name_or_path, fname)
            if os.path.exists(p):
                return gpt2_params_from_hf(load_torch_state_dict(p), cfg), cfg
        raise FileNotFoundError(f"no weights file in {name_or_path}")

    if name_or_path == "gpt2-test":  # test preset has no pretrained weights
        return init_gpt2(GPT2_PRESETS[name_or_path]), GPT2_PRESETS[name_or_path]

    try:
        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(name_or_path)
        cfg = gpt2_config_from_hf(model.config)
        return gpt2_params_from_hf(model.state_dict(), cfg), cfg
    except Exception:
        pass

    if name_or_path in GPT2_PRESETS:
        import warnings

        warnings.warn(
            f"Could not fetch pretrained weights for '{name_or_path}' "
            "(offline?). Using RANDOM initialization — fine for benchmarks "
            "and training from scratch, wrong for pretrained captioning."
        )
        cfg = GPT2_PRESETS[name_or_path]
        return init_gpt2(cfg), cfg
    raise ValueError(f"cannot resolve language model '{name_or_path}'")
