"""RoBERTa text encoder in pure JAX — the CLAP text tower.

laion_clap's text branch is a RoBERTa-base followed by a 2-layer MLP
projection into the 512-d joint audio-text space
(/root/reference/clipcap/encoders/clap.py:121 calls
``laion_clap.CLAP_Module``, whose text path is RobertaModel →
``text_projection``).  This makes the audio demo/eval rerank
(similarity between the input clip and candidate captions,
reference demo.py:47-66) possible without torch.

Implementation notes (match HF ``RobertaModel`` exactly — parity-tested in
tests/test_parity.py):

* position ids are the RoBERTa quirk: ``padding_idx + cumsum(mask)`` so pad
  positions keep the padding embedding (HF create_position_ids_from_input_ids);
* post-LN (BERT-style) encoder blocks, exact GELU;
* ``pooler_output`` = tanh(dense(hidden[:, 0])).

Layer-stacked params + ``lax.scan`` over the encoder, like gpt2.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.ops.layers import layer_norm, linear

Array = jax.Array
Params = Dict[str, Any]

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    name: str = "roberta-base"


def init_roberta(cfg: RobertaConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size

    def lin(in_d, out_d):
        w = rng.normal(0, 0.02, size=(L, in_d, out_d)).astype(np.float32)
        b = np.zeros((L, out_d), np.float32)
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    def ln():
        return {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))}

    return {
        "word_embeddings": jnp.asarray(
            rng.normal(0, 0.02, size=(cfg.vocab_size, D)).astype(np.float32)),
        "position_embeddings": jnp.asarray(
            rng.normal(0, 0.02, size=(cfg.max_position_embeddings, D)).astype(np.float32)),
        "token_type_embeddings": jnp.asarray(
            rng.normal(0, 0.02, size=(cfg.type_vocab_size, D)).astype(np.float32)),
        "emb_ln": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "layers": {
            "q": lin(D, D), "k": lin(D, D), "v": lin(D, D),
            "attn_out": lin(D, D), "attn_ln": ln(),
            "fc1": lin(D, F), "fc2": lin(F, D), "out_ln": ln(),
        },
        "pooler": {"w": jnp.asarray(rng.normal(0, 0.02, size=(D, D)).astype(np.float32)),
                   "b": jnp.zeros((D,))},
    }


def _block(x: Array, layer: Params, mask_bias: Array, cfg: RobertaConfig,
           precision) -> Array:
    B, S, D = x.shape
    H = cfg.num_heads
    Dh = D // H
    scale = 1.0 / np.sqrt(Dh)

    q = linear(x, layer["q"]["w"], layer["q"]["b"], precision).reshape(B, S, H, Dh)
    k = linear(x, layer["k"]["w"], layer["k"]["b"], precision).reshape(B, S, H, Dh)
    v = linear(x, layer["v"]["w"], layer["v"]["b"], precision).reshape(B, S, H, Dh)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, precision=precision) * scale
    logits = logits.astype(jnp.float32) + mask_bias
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhnm,bmhd->bnhd", w, v, precision=precision).reshape(B, S, D)
    attn = linear(attn, layer["attn_out"]["w"], layer["attn_out"]["b"], precision)
    x = layer_norm(x + attn, layer["attn_ln"]["scale"], layer["attn_ln"]["bias"],
                   cfg.layer_norm_eps)

    h = linear(x, layer["fc1"]["w"], layer["fc1"]["b"], precision)
    h = jax.nn.gelu(h, approximate=False)  # HF BERT/RoBERTa use exact gelu
    h = linear(h, layer["fc2"]["w"], layer["fc2"]["b"], precision)
    return layer_norm(x + h, layer["out_ln"]["scale"], layer["out_ln"]["bias"],
                      cfg.layer_norm_eps)


def roberta_apply(
    params: Params,
    cfg: RobertaConfig,
    input_ids: Array,              # [B, S] int32
    attention_mask: Optional[Array] = None,  # [B, S] 1=real, 0=pad
    *,
    dtype=jnp.float32,
    precision=None,
):
    """Returns ``(last_hidden_state [B,S,D], pooler_output [B,D])``."""
    B, S = input_ids.shape
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    mask = attention_mask.astype(jnp.int32)

    # RoBERTa position ids: padding_idx + cumsum(mask)·mask.
    positions = (jnp.cumsum(mask, axis=1) * mask) + cfg.pad_token_id

    x = jnp.take(params["word_embeddings"], input_ids, axis=0)
    x = x + jnp.take(params["position_embeddings"], positions, axis=0)
    x = x + params["token_type_embeddings"][0][None, None]
    x = layer_norm(x, params["emb_ln"]["scale"], params["emb_ln"]["bias"],
                   cfg.layer_norm_eps).astype(dtype)

    mask_bias = jnp.where(mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
    mask_bias = mask_bias[:, None, None, :]  # [B,1,1,S]

    def scan_fn(carry, layer):
        return _block(carry, layer, mask_bias, cfg, precision), None

    x, _ = jax.lax.scan(scan_fn, x, params["layers"])

    pooled = jnp.tanh(
        jnp.dot(x[:, 0], params["pooler"]["w"].astype(x.dtype),
                precision=precision) + params["pooler"]["b"].astype(x.dtype)
    )
    return x, pooled


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def roberta_params_from_hf(state_dict, cfg: RobertaConfig,
                           prefix: str = "") -> Params:
    """Convert an HF ``RobertaModel`` state dict (optionally under a key
    prefix such as laion_clap's ``text_branch.``)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    L = cfg.num_layers

    def stack_lin(fmt):
        w = np.stack([_np(sd[fmt.format(i) + ".weight"]).T for i in range(L)])
        b = np.stack([_np(sd[fmt.format(i) + ".bias"]) for i in range(L)])
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    def stack_ln(fmt):
        return {
            "scale": jnp.asarray(np.stack([_np(sd[fmt.format(i) + ".weight"]) for i in range(L)])),
            "bias": jnp.asarray(np.stack([_np(sd[fmt.format(i) + ".bias"]) for i in range(L)])),
        }

    return {
        "word_embeddings": jnp.asarray(_np(sd["embeddings.word_embeddings.weight"])),
        "position_embeddings": jnp.asarray(_np(sd["embeddings.position_embeddings.weight"])),
        "token_type_embeddings": jnp.asarray(_np(sd["embeddings.token_type_embeddings.weight"])),
        "emb_ln": {"scale": jnp.asarray(_np(sd["embeddings.LayerNorm.weight"])),
                   "bias": jnp.asarray(_np(sd["embeddings.LayerNorm.bias"]))},
        "layers": {
            "q": stack_lin("encoder.layer.{}.attention.self.query"),
            "k": stack_lin("encoder.layer.{}.attention.self.key"),
            "v": stack_lin("encoder.layer.{}.attention.self.value"),
            "attn_out": stack_lin("encoder.layer.{}.attention.output.dense"),
            "attn_ln": stack_ln("encoder.layer.{}.attention.output.LayerNorm"),
            "fc1": stack_lin("encoder.layer.{}.intermediate.dense"),
            "fc2": stack_lin("encoder.layer.{}.output.dense"),
            "out_ln": stack_ln("encoder.layer.{}.output.LayerNorm"),
        },
        "pooler": {"w": jnp.asarray(_np(sd["pooler.dense.weight"]).T),
                   "b": jnp.asarray(_np(sd["pooler.dense.bias"]))},
    }


def roberta_config_from_hf(hf_config) -> RobertaConfig:
    return RobertaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        pad_token_id=hf_config.pad_token_id,
    )
