"""The assembled ClipCap model: mapping network + GPT-2 decoder.

Reference: ``ClipCapModel`` / ``ClipCapModelPrefixOnly``
(/root/reference/clipcap/model/model.py:14-123) — a LightningModule holding
an HF LM and a mapper.  TPU-native shape: a lightweight struct of configs
plus one params pytree ``{"mapper": …, "lm": …}``; forward/loss are pure
functions ready for ``pjit``.  Prefix-only training (the reference's
``ClipCapModelPrefixOnly.parameters()`` override, model.py:116-123) becomes
an optax mask over the ``lm`` subtree — see clipcap_tpu.train.state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.config import Config
from clipcap_tpu.models.gpt2 import (
    GPT2Config,
    get_gpt2_config,
    gpt2_apply,
    gpt2_embed_tokens,
    init_gpt2,
)
from clipcap_tpu.models.mapper import MapperConfig, init_mapper, mapper_apply

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass
class ClipCapModel:
    """Bundle of configs + params. ``train_language_model`` picks the
    reference's ClipCapModel vs ClipCapModelPrefixOnly behavior."""

    config: Config
    lm_config: GPT2Config
    mapper_config: MapperConfig
    params: Params  # {"mapper": ..., "lm": ...}

    @property
    def prefix_length(self) -> int:
        return self.config.prefix_length

    def transformer_mapper(self, embeddings: Array, dtype=jnp.float32, precision=None) -> Array:
        """Prefix projection, the analog of ``model.transformer_mapper(embeds)``
        (reference demo.py:34)."""
        return mapper_apply(self.params["mapper"], self.mapper_config, embeddings,
                            dtype=dtype, precision=precision)


def build_mapper_config(config: Config, lm_embedding_size: int) -> MapperConfig:
    """Mirror the reference's constructor wiring (model.py:21-41): the
    windowed mapper gets ``window_size + 1`` windows (global + tiles)."""
    enc = config.encoder_config
    window = None
    use_pos = False
    if enc is not None and enc.use_windowed_embeddings:
        window = enc.window_size + 1
        use_pos = config.use_positional_embeddings
    return MapperConfig(
        encoder_embedding_size=enc.encoder_embedding_size if enc else 512,
        lm_embedding_size=lm_embedding_size,
        prefix_length=config.prefix_length,
        projection_length=config.projection_length,
        num_heads=config.transformer_attention_heads,
        num_layers=config.transformer_layers,
        window_size=window,
        use_pos_embeddings=use_pos,
    )


def init_clipcap(
    config: Config,
    lm_params: Optional[Params] = None,
    lm_config: Optional[GPT2Config] = None,
    seed: int = 0,
) -> ClipCapModel:
    """Build a ClipCap model. LM weights come from ``load_gpt2`` resolution
    unless supplied; the mapper is always freshly initialized."""
    if lm_config is None:
        from clipcap_tpu.models.hf_import import load_gpt2

        lm_params, lm_config = load_gpt2(config.language_model)
    elif lm_params is None:
        lm_params = init_gpt2(lm_config, seed=seed)

    mapper_config = build_mapper_config(config, lm_config.n_embd)
    mapper_params = init_mapper(mapper_config, seed=seed)
    return ClipCapModel(
        config=config,
        lm_config=lm_config,
        mapper_config=mapper_config,
        params={"mapper": mapper_params, "lm": lm_params},
    )


# ---------------------------------------------------------------------------
# Forward + loss (reference model.py:43-58, 94-113)
# ---------------------------------------------------------------------------


def clipcap_forward(
    params: Params,
    lm_cfg: GPT2Config,
    mapper_cfg: MapperConfig,
    tokens: Array,          # [B, T] int, -1 padded (dataloader contract)
    embeddings: Array,      # [B, E] or [B, W, E]
    mask: Array,            # [B, T] bool
    *,
    dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    return_logits: bool = True,
) -> Array:
    """Concat prefix + token embeddings, run the LM. Returns logits
    [B, prefix+T, V] (or the final hidden states when
    ``return_logits=False`` — the loss projects them in chunks)."""
    token_embeddings = gpt2_embed_tokens(params["lm"], tokens, dtype)
    prefix = mapper_apply(params["mapper"], mapper_cfg, embeddings,
                          dtype=dtype, precision=precision)
    inputs_embeds = jnp.concatenate([prefix, token_embeddings], axis=1)
    prefix_mask = jnp.ones(prefix.shape[:2], dtype=bool)
    full_mask = jnp.concatenate([prefix_mask, mask.astype(bool)], axis=1)
    out, _ = gpt2_apply(
        params["lm"], lm_cfg, inputs_embeds=inputs_embeds,
        attention_mask=full_mask, dtype=dtype, precision=precision, remat=remat,
        return_logits=return_logits,
    )
    return out


def clipcap_loss(
    params: Params,
    lm_cfg: GPT2Config,
    mapper_cfg: MapperConfig,
    prefix_length: int,
    tokens: Array,       # [B, T] int32, -1 pads
    embeddings: Array,
    *,
    dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    freeze_lm: bool = False,
) -> Array:
    """Cross-entropy over caption tokens (reference training_step,
    model.py:94-113).

    The reference rewrites pads to 0 and uses ``ignore_index=0``, which also
    silently drops real GPT-2 token id 0 ("!") — a documented bug
    (SURVEY.md). Here the loss masks on the *pad positions* (-1) directly.

    ``freeze_lm`` (prefix-only training): stop_gradient on the LM params so
    XLA provably drops the LM *weight*-gradient einsums — the bulk of the
    backward FLOPs — while activation gradients still flow to the mapper.
    (The optimizer's set_to_zero mask makes those grads dead anyway, but
    the stop_gradient guarantees the elimination at trace time.)
    """
    if freeze_lm:
        params = dict(params, lm=jax.lax.stop_gradient(params["lm"]))
    mask = tokens >= 0
    safe_tokens = jnp.where(mask, tokens, 0)

    hidden = clipcap_forward(
        params, lm_cfg, mapper_cfg, safe_tokens, embeddings, mask,
        dtype=dtype, precision=precision, remat=remat, return_logits=False,
    )
    # Predict token t from position prefix_length-1+t (model.py:108).
    T = tokens.shape[1]
    pred_h = hidden[:, prefix_length - 1 : prefix_length - 1 + T]  # [B,T,D]
    wte = params["lm"]["wte"]

    # Chunked cross-entropy: the full [B, T, V] fp32 logits tensor is the
    # training-memory hog (batch 256 × 64 tokens × 50k vocab ≈ 3.8 GB per
    # live copy — measured HBM OOM).  Project chunks of positions under
    # jax.checkpoint so the backward pass recomputes each chunk's logits
    # instead of keeping them all resident.
    chunk = 16
    pad_t = (-T) % chunk
    if pad_t:
        pred_h = jnp.pad(pred_h, ((0, 0), (0, pad_t), (0, 0)))
        safe_tokens = jnp.pad(safe_tokens, ((0, 0), (0, pad_t)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_t)))
    n_chunks = pred_h.shape[1] // chunk
    B = pred_h.shape[0]
    hc = pred_h.reshape(B, n_chunks, chunk, -1).transpose(1, 0, 2, 3)
    tc = safe_tokens.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    mc = mask.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_nll(h, t, m):
        logits = jnp.dot(h, wte.T.astype(h.dtype), precision=precision)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tl = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
        return -(tl * m.astype(jnp.float32)).sum()

    def scan_fn(acc, xs):
        h, t, m = xs
        return acc + chunk_nll(h, t, m), None

    nll, _ = jax.lax.scan(scan_fn, jnp.float32(0.0), (hc, tc, mc))
    weights = mask.astype(jnp.float32)
    return nll / jnp.maximum(weights.sum(), 1.0)


# ---------------------------------------------------------------------------
# Loading (reference model/load.py:9-43)
# ---------------------------------------------------------------------------


def load(model_path: str, config_path: str, device: str = "tpu",
         from_checkpoint: bool = False) -> Tuple[ClipCapModel, Any]:
    """Load a trained model + tokenizer from (weights, yaml-config).

    Accepts our orbax/npz checkpoints AND reference PyTorch ``.pt``/``.ckpt``
    state dicts (converted on the fly) so reference-trained mappers can be
    served from this framework.
    """
    from clipcap_tpu.config import load_yaml_config
    from clipcap_tpu.utils.tokenizer import get_tokenizer

    config = load_yaml_config(config_path)
    if from_checkpoint and config.training_config is not None:
        config.training_config = None

    model = init_clipcap(config)

    if model_path:
        if model_path.endswith((".npz", ".msgpack")) or _is_orbax_dir(model_path):
            from clipcap_tpu.train.checkpoint import restore_params

            model.params = restore_params(model_path, model.params)
        else:
            # Reference torch state dict (.pt or PL .ckpt with "state_dict").
            from clipcap_tpu.models.hf_import import gpt2_params_from_hf, load_torch_state_dict
            from clipcap_tpu.models.mapper import mapper_params_from_torch

            sd = load_torch_state_dict(model_path)
            if from_checkpoint and "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
                sd = sd["state_dict"]
            model.params["mapper"] = mapper_params_from_torch(sd, model.mapper_config)
            lm_keys = {k[len("language_model."):]: v for k, v in sd.items()
                       if k.startswith("language_model.")}
            if lm_keys:
                model.params["lm"] = gpt2_params_from_hf(lm_keys, model.lm_config)

    tokenizer = get_tokenizer(config.language_model)
    return model, tokenizer


def _is_orbax_dir(path: str) -> bool:
    import os

    return os.path.isdir(path)
