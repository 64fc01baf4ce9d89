"""GPT-2 decoder family, implemented TPU-first in pure JAX.

Capability parity with the reference's HF ``AutoModelForCausalLM`` usage
(/root/reference/clipcap/model/model.py:19 loads a GPT-2-family LM and calls
it with ``inputs_embeds`` + ``attention_mask``; the decode loops re-forward
the whole sequence every step, e.g. /root/reference/clipcap/inference/no_beam.py:38).

TPU-first differences from the reference:

* Parameters are a pytree with the *layer* dimension stacked on axis 0 so
  the transformer body is a single ``lax.scan`` — one compiled block instead
  of ``n_layer`` unrolled ones (faster compiles, natural remat boundary).
* Decoding uses a preallocated fixed-shape KV cache updated with
  ``lax.dynamic_update_slice`` — no growing ``inputs_embeds``, no dynamic
  shapes, everything stays resident on-chip under ``jit``.
* Compute dtype is configurable (bfloat16 for throughput on the MXU,
  float32 + ``Precision.HIGHEST`` for token-for-token parity runs).

Weight import from HF checkpoints lives in ``clipcap_tpu.models.hf_import``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.ops.layers import ACTIVATIONS, embed, layer_norm, linear, normal_init, ones_init, zeros_init

Array = jax.Array
Params = Dict[str, Any]

NEG_INF = -1e9  # finite mask value: keeps softmax well-defined in bf16


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    activation: str = "gelu_new"
    name: str = "gpt2"

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


# The GPT-2 family the reference exposes through --language-model
# (/root/reference/clipcap/model/args.py:6-10, default "gpt2-xl").
GPT2_PRESETS: Dict[str, GPT2Config] = {
    "distilgpt2": GPT2Config(n_layer=6, name="distilgpt2"),
    "gpt2": GPT2Config(name="gpt2"),
    "gpt2-medium": GPT2Config(n_embd=1024, n_layer=24, n_head=16, name="gpt2-medium"),
    "gpt2-large": GPT2Config(n_embd=1280, n_layer=36, n_head=20, name="gpt2-large"),
    "gpt2-xl": GPT2Config(n_embd=1600, n_layer=48, n_head=25, name="gpt2-xl"),
    # Test-scale preset (not an HF model): full GPT-2 vocab, tiny body.
    # Used by integration tests and offline smoke runs of the CLIs.
    "gpt2-test": GPT2Config(n_embd=64, n_layer=2, n_head=4, n_positions=256,
                            name="gpt2-test"),
}


def get_gpt2_config(name: str) -> GPT2Config:
    if name in GPT2_PRESETS:
        return GPT2_PRESETS[name]
    raise ValueError(
        f"unknown GPT-2 preset '{name}'. Known: {sorted(GPT2_PRESETS)}. "
        "Pass a GPT2Config directly for custom sizes."
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_gpt2(cfg: GPT2Config, seed: int = 0) -> Params:
    """Random-initialized GPT-2 params (layer-stacked pytree).

    Matches HF's init distribution (normal(0, initializer_range=0.02),
    zero biases, unit LN scales) so randomly-initialized models have
    sane activation scales.
    """
    rng = np.random.default_rng(seed)
    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    F = 4 * D

    def ln(shape_d):
        return {"scale": ones_init((L, shape_d)), "bias": zeros_init((L, shape_d))}

    params: Params = {
        "wte": normal_init(rng, (cfg.vocab_size, D)),
        "wpe": normal_init(rng, (cfg.n_positions, D), std=0.01),
        "h": {
            "ln_1": ln(D),
            "attn": {
                "c_attn": {"w": normal_init(rng, (L, D, 3 * D)), "b": zeros_init((L, 3 * D))},
                "c_proj": {"w": normal_init(rng, (L, D, D)), "b": zeros_init((L, D))},
            },
            "ln_2": ln(D),
            "mlp": {
                "c_fc": {"w": normal_init(rng, (L, D, F)), "b": zeros_init((L, F))},
                "c_proj": {"w": normal_init(rng, (L, F, D)), "b": zeros_init((L, D))},
            },
        },
        "ln_f": {"scale": ones_init((D,)), "bias": zeros_init((D,))},
    }
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> Params:
    """Preallocated fixed-shape KV cache: ``[n_layer, batch, n_head, max_len, head_dim]``."""
    shape = (cfg.n_layer, batch, cfg.n_head, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array],
    precision,
) -> Array:
    """Softmax attention. q: [B,S,H,Dh]; k,v: [B,T,H,Dh]; bias: [B,1,S,T] additive."""
    head_dim = q.shape[-1]
    scale = 1.0 / np.sqrt(head_dim)
    logits = jnp.einsum("bshd,bthd->bhst", q, k, precision=precision) * scale
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", weights, v, precision=precision)


def _block(
    x: Array,
    layer: Params,
    cache_kv: Optional[Tuple[Array, Array]],
    cache_index: Optional[Array],
    bias: Optional[Array],
    cfg: GPT2Config,
    precision,
) -> Tuple[Array, Optional[Tuple[Array, Array]]]:
    """One transformer block. ``layer`` holds this layer's (unstacked) params."""
    B, S, D = x.shape
    H, Dh = cfg.n_head, cfg.head_dim

    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], cfg.layer_norm_epsilon)
    qkv = linear(h, layer["attn"]["c_attn"]["w"], layer["attn"]["c_attn"]["b"], precision)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, H, Dh)
    v = v.reshape(B, S, H, Dh)

    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv  # [B, H, T, Dh]
        k_t = k.transpose(0, 2, 1, 3).astype(ck.dtype)  # [B,H,S,Dh]
        v_t = v.transpose(0, 2, 1, 3).astype(cv.dtype)
        ck = jax.lax.dynamic_update_slice(ck, k_t, (0, 0, cache_index, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_t, (0, 0, cache_index, 0))
        new_cache = (ck, cv)
        k_all = ck.transpose(0, 2, 1, 3).astype(x.dtype)  # [B,T,H,Dh]
        v_all = cv.transpose(0, 2, 1, 3).astype(x.dtype)
        attn_out = _attention(q, k_all, v_all, bias, precision)
    else:
        attn_out = _attention(q, k, v, bias, precision)

    attn_out = attn_out.reshape(B, S, D)
    attn_out = linear(attn_out, layer["attn"]["c_proj"]["w"], layer["attn"]["c_proj"]["b"], precision)
    x = x + attn_out

    h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], cfg.layer_norm_epsilon)
    h = linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], precision)
    h = ACTIVATIONS[cfg.activation](h)
    h = linear(h, layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], precision)
    x = x + h
    return x, new_cache


def causal_bias(S: int, T: int, offset: Array | int = 0) -> Array:
    """Additive causal bias [1,1,S,T]: query i may attend key j iff j <= offset + i."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0) + offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
    allowed = k_pos <= q_pos
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[None, None]


def gpt2_apply(
    params: Params,
    cfg: GPT2Config,
    *,
    input_ids: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    attention_mask: Optional[Array] = None,
    kv_cache: Optional[Params] = None,
    cache_index: Optional[Array] = None,
    dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    return_logits: bool = True,
):
    """GPT-2 forward.

    Modes
    -----
    * **Full sequence** (``kv_cache=None``): causal self-attention over the
      input; equivalent to the reference's
      ``language_model(inputs_embeds=…, attention_mask=…)`` call
      (/root/reference/clipcap/model/model.py:56).
    * **Incremental decode** (``kv_cache`` given): writes the new K/V at
      ``cache_index`` and attends over the whole preallocated cache with a
      fixed-shape mask. ``attention_mask``, if given, is a [B, max_len]
      validity mask over *cache slots*.

    Returns ``(logits_or_hidden, new_kv_cache)``.
    """
    if inputs_embeds is None:
        inputs_embeds = embed(params["wte"], input_ids, dtype)
    x = inputs_embeds.astype(dtype)
    B, S, D = x.shape

    if kv_cache is not None:
        offset = cache_index
        T = kv_cache["k"].shape[3]
    else:
        offset = 0
        T = S

    positions = offset + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    x = x + jnp.take(params["wpe"], positions, axis=0).astype(dtype).reshape(1, S, D)

    bias = causal_bias(S, T, offset)
    if attention_mask is not None:
        pad_bias = jnp.where(attention_mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
        bias = bias + pad_bias[:, None, None, :]

    block = partial(_block, cfg=cfg, precision=precision)
    if remat:
        block = jax.checkpoint(block, static_argnums=())

    if kv_cache is not None:
        def scan_fn(carry, layer_and_cache):
            h = carry
            layer, (ck, cv) = layer_and_cache
            h, new_kv = _scan_block(h, layer, (ck, cv))
            return h, new_kv

        def _scan_block(h, layer, kvs):
            return block(h, layer, kvs, cache_index, bias)

        x, (new_k, new_v) = jax.lax.scan(
            scan_fn, x, (params["h"], (kv_cache["k"], kv_cache["v"]))
        )
        new_cache = {"k": new_k, "v": new_v}
    else:
        def scan_fn(carry, layer):
            h, _ = block(carry, layer, None, None, bias)
            return h, None

        x, _ = jax.lax.scan(scan_fn, x, params["h"])
        new_cache = None

    x = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"], cfg.layer_norm_epsilon)
    if return_logits:
        logits = jnp.dot(x, params["wte"].T.astype(x.dtype), precision=precision)
        return logits, new_cache
    return x, new_cache


def gpt2_embed_tokens(params: Params, token_ids: Array, dtype=jnp.float32) -> Array:
    """Token-embedding lookup, the analog of
    ``language_model.get_input_embeddings()(tokens)``
    (/root/reference/clipcap/model/model.py:45)."""
    return embed(params["wte"], token_ids, dtype)


def num_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
