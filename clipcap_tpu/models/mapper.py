"""Mapping networks: encoder embedding → LM prefix embeddings.

Semantics-parity with the reference's mapping networks
(/root/reference/clipcap/model/mapper.py):

* ``TransformerMapper`` (mapper.py:113-130): linear projects the encoder
  embedding to ``projection_length * lm_dim``, concatenates a learned
  ``prefix_const`` of ``prefix_length`` tokens, runs an 8-layer pre-norm
  transformer (ReLU MLP, mlp_ratio 2.0, bias-free QKV — mapper.py:10,
  attention.py:32-40) and returns the trailing ``prefix_length`` slice.
* ``TransformerMapperWindowed`` (mapper.py:133-160): same, but the linear
  maps to ``window_size * projection_length`` tokens with optional learned
  positional embeddings added before the concat.
* ``MLPTransformer`` (mapper.py:70-88) is the per-layer MLP.

TPU-first: layers are stacked and scanned; params are a pytree; the whole
mapper jits into one fused XLA computation.  The reference's attention-mask
path is dead code with a tensor-truthiness bug (attention.py:33-36,
documented in SURVEY.md §"bugs") — masks are intentionally unsupported here.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.ops.layers import layer_norm, linear, normal_init, ones_init, relu, torch_linear_init, zeros_init

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    encoder_embedding_size: int
    lm_embedding_size: int
    prefix_length: int = 10
    projection_length: int = 10
    num_heads: int = 8
    num_layers: int = 8
    mlp_ratio: float = 2.0
    # Windowed variant (reference mapper.py:133; constructed with
    # window_size = encoder window_size + 1 at model.py:22-32).
    window_size: Optional[int] = None
    use_pos_embeddings: bool = False
    layer_norm_epsilon: float = 1e-5

    @property
    def windowed(self) -> bool:
        return self.window_size is not None

    @property
    def n_proj_tokens(self) -> int:
        """Tokens produced by the projection (before the learned prefix)."""
        if self.windowed:
            return self.window_size * self.projection_length
        return self.projection_length

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def init_mapper(cfg: MapperConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    L, D = cfg.num_layers, cfg.lm_embedding_size
    F = int(D * cfg.mlp_ratio)

    def stack_linear(in_dim, out_dim, bias=True):
        ws, bs = [], []
        for _ in range(L):
            w, b = torch_linear_init(rng, in_dim, out_dim)
            ws.append(w)
            bs.append(b)
        out = {"w": jnp.stack(ws)}
        if bias:
            out["b"] = jnp.stack(bs)
        return out

    # E → projection_length·D for BOTH variants (reference mapper.py:119,140):
    # the windowed mapper applies the same per-window projection to each of
    # the W windows and flattens to n_proj_tokens afterwards.
    lw, lb = torch_linear_init(rng, cfg.encoder_embedding_size,
                               cfg.projection_length * D)

    params: Params = {
        "linear": {"w": lw, "b": lb},
        "prefix_const": normal_init(rng, (cfg.prefix_length, D), std=1.0),
        "layers": {
            "ln_1": {"scale": ones_init((L, D)), "bias": zeros_init((L, D))},
            # Reference MultiHeadAttention with bias=False for Q/KV
            # (mapper.py TransformerLayer bias=False default) but the output
            # projection keeps its bias (attention.py:14 nn.Linear default).
            "to_queries": {"w": stack_linear(D, D, bias=False)["w"]},
            "to_keys_values": {"w": stack_linear(D, 2 * D, bias=False)["w"]},
            "project": stack_linear(D, D, bias=True),
            "ln_2": {"scale": ones_init((L, D)), "bias": zeros_init((L, D))},
            "fc1": stack_linear(D, F, bias=True),
            "fc2": stack_linear(F, D, bias=True),
        },
    }
    if cfg.windowed and cfg.use_pos_embeddings:
        params["pos_embeddings"] = normal_init(rng, (cfg.n_proj_tokens, D), std=1.0)
    return params


def _mapper_block(x: Array, layer: Params, cfg: MapperConfig, precision) -> Array:
    """Pre-norm transformer layer, fused-KV attention (reference attention.py)."""
    B, N, D = x.shape
    H = cfg.num_heads
    Dh = D // H

    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], cfg.layer_norm_epsilon)
    q = linear(h, layer["to_queries"]["w"], None, precision).reshape(B, N, H, Dh)
    kv = linear(h, layer["to_keys_values"]["w"], None, precision).reshape(B, N, 2, H, Dh)
    k, v = kv[:, :, 0], kv[:, :, 1]

    scale = Dh ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bnmh", q, k, precision=precision) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=2).astype(x.dtype)
    attn = jnp.einsum("bnmh,bmhd->bnhd", weights, v, precision=precision).reshape(B, N, D)
    attn = linear(attn, layer["project"]["w"], layer["project"]["b"], precision)
    x = x + attn

    h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], cfg.layer_norm_epsilon)
    h = linear(h, layer["fc1"]["w"], layer["fc1"]["b"], precision)
    h = relu(h)
    h = linear(h, layer["fc2"]["w"], layer["fc2"]["b"], precision)
    return x + h


def mapper_apply(
    params: Params,
    cfg: MapperConfig,
    embedding: Array,
    *,
    dtype=jnp.float32,
    precision=None,
) -> Array:
    """Map encoder embeddings to ``prefix_length`` LM prefix embeddings.

    ``embedding``: ``[B, E]`` for the plain mapper, ``[B, W, E]`` (global +
    tiles) for the windowed one (reference model.py:22-41 chooses variants).
    Returns ``[B, prefix_length, lm_dim]``.
    """
    D = cfg.lm_embedding_size
    B = embedding.shape[0]
    emb = embedding.astype(dtype)

    if cfg.windowed:
        # [B, W, E] → per-window projection of projection_length tokens each;
        # matches the reference flatten: linear(x).view(B, W*P, -1)
        # (mapper.py:148) because the same linear is applied per window and
        # windows are contiguous in the flattened token axis.
        x = linear(emb, params["linear"]["w"], params["linear"]["b"], precision)
        x = x.reshape(B, cfg.n_proj_tokens, D)
        if "pos_embeddings" in params:
            x = x + params["pos_embeddings"].astype(dtype)[None]
    else:
        x = linear(emb, params["linear"]["w"], params["linear"]["b"], precision)
        x = x.reshape(B, cfg.projection_length, D)

    prefix = jnp.broadcast_to(
        params["prefix_const"].astype(dtype)[None], (B, cfg.prefix_length, D)
    )
    x = jnp.concatenate([x, prefix], axis=1)

    def scan_fn(carry, layer):
        return _mapper_block(carry, layer, cfg, precision), None

    x, _ = jax.lax.scan(scan_fn, x, params["layers"])
    return x[:, cfg.n_proj_tokens :]


# ---------------------------------------------------------------------------
# Reference-checkpoint import (torch state dict → our pytree)
# ---------------------------------------------------------------------------


def mapper_params_from_torch(state_dict, cfg: MapperConfig, prefix: str = "transformer_mapper.") -> Params:
    """Convert a reference ``TransformerMapper(Windowed)`` state dict.

    torch ``nn.Linear`` stores ``weight`` as ``[out, in]`` → transpose to our
    ``[in, out]``.  Layer tensors are stacked for ``lax.scan``.
    """

    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items() if k.startswith(prefix)}
    if not sd:  # maybe the dict is already mapper-only
        sd = {k: _np(v) for k, v in state_dict.items()}

    L = cfg.num_layers

    def stack_lin_w(fmt):
        return jnp.asarray(
            np.stack([sd[fmt.format(i)].T for i in range(L)]).astype(np.float32)
        )

    def stack_vec(fmt):
        return jnp.asarray(np.stack([sd[fmt.format(i)] for i in range(L)]).astype(np.float32))

    params: Params = {
        "linear": {
            "w": jnp.asarray(sd["linear.weight"].T.astype(np.float32)),
            "b": jnp.asarray(sd["linear.bias"].astype(np.float32)),
        },
        "prefix_const": jnp.asarray(sd["prefix_const"].astype(np.float32)),
        "layers": {
            "ln_1": {"scale": stack_vec("transformer.layers.{}.norm1.weight"),
                     "bias": stack_vec("transformer.layers.{}.norm1.bias")},
            "to_queries": {"w": stack_lin_w("transformer.layers.{}.attn.to_queries.weight")},
            "to_keys_values": {"w": stack_lin_w("transformer.layers.{}.attn.to_keys_values.weight")},
            "project": {"w": stack_lin_w("transformer.layers.{}.attn.project.weight"),
                        "b": stack_vec("transformer.layers.{}.attn.project.bias")},
            "ln_2": {"scale": stack_vec("transformer.layers.{}.norm2.weight"),
                     "bias": stack_vec("transformer.layers.{}.norm2.bias")},
            "fc1": {"w": stack_lin_w("transformer.layers.{}.mlp.fc1.weight"),
                    "b": stack_vec("transformer.layers.{}.mlp.fc1.bias")},
            "fc2": {"w": stack_lin_w("transformer.layers.{}.mlp.fc2.weight"),
                    "b": stack_vec("transformer.layers.{}.mlp.fc2.bias")},
        },
    }
    if "pos_embeddings" in sd:
        params["pos_embeddings"] = jnp.asarray(sd["pos_embeddings"].astype(np.float32))
    return params
