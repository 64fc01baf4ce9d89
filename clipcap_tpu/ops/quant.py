"""Int8 weight residency for decode serving.

Autoregressive decode is HBM-bound on *weight reads*: every step streams
every matmul weight once (gpt2-xl: 3.1 GB/step in bf16).  Storing the
transformer matmul weights as int8 with per-output-channel absmax scales
halves that traffic; XLA fuses the int8→bf16 widening into the dot's
operand stream, and the per-channel scale into its epilogue
(``ops/layers.linear`` handles the ``{"q", "s"}`` form transparently).

This is a *serving* transform (the analog of the w8a16 deployments common
for GPT-class serving): per-channel int8 weight quantization is
numerically tame — logits move on the order of bf16 rounding — but it is
kept opt-in (``--int8-weights`` on the inference/eval CLIs) and off for
parity runs.  Embeddings (``wte``/``wpe``) and layer norms stay in bf16:
``wte`` doubles as the logits projection where int8 error would directly
perturb token ranking, and together they are a small fraction of the
bytes.

Reference: the torch baseline has no quantized path — this is a
TPU-serving addition, not a parity feature.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_linear(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8: ``w ≈ q * s`` with
    ``s = absmax / 127`` over the input dim.  ``w`` is ``[..., in, out]``
    (a leading layer-stack dim is treated as part of the channel index, so
    every layer gets its own scales)."""
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    s = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s[..., 0, :].astype(jnp.float32)}


def quantize_rows(x: jax.Array):
    """Dynamic per-row (per-token) symmetric int8 over the trailing dim:
    ``x ≈ q * s`` with ``s = absmax / 127``.  The row scale is computed on
    the fly — this is the activation side of a w8a8 matmul."""
    absmax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
    s = jnp.maximum(absmax, 1e-8) / 127.0
    # Clip like quantize_linear: today the fp32 quotient never reaches
    # 127.5, but int8 overflow wraps silently, so don't rely on it.
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_linear(x: jax.Array, w: Dict[str, jax.Array], b=None,
                precision=None) -> jax.Array:
    """w8a8 linear: dynamic per-token activation int8 × per-channel int8
    weight, contracted as int8×int8→int32 **on the MXU** (TPU v5e runs int8
    dots at 2x the bf16 FLOP rate), rescaled in fp32.

    ``w`` is the ``{"q": int8 [in, out], "s": fp32 [out]}`` form from
    ``quantize_linear``.  Unlike ``ops/layers.linear``'s weight-only int8
    path (which widens q to the activation dtype and pays bf16 FLOPs), this
    quantizes the *activations* too, so the dot itself runs at the int8
    rate; error is per-token-absmax rounding on x plus per-channel rounding
    on w.  ``precision`` is accepted for signature compatibility (integer
    dots have no precision knob)."""
    del precision
    q, s = quantize_rows(x)
    acc = jax.lax.dot_general(
        q, w["q"], (((q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * w["s"].astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_clip_visual_int8(params: Params) -> Params:
    """Return a copy of a CLIP vision param tree (models/clip_vit.py layout)
    with the stacked block matmul weights (attn in_proj/out_proj, mlp
    c_fc/c_proj) in int8 ``{"q","s"}`` form.  The leading layer-stack dim is
    preserved (``quantize_linear`` scales per (layer, out_channel)), so the
    quantized leaves slice through ``lax.scan`` like the fp32 ones.
    Patch embed, class/positional embeddings, layer norms, and the final
    projection stay in float — they are a small fraction of the FLOPs and
    the fold of pixel normalization into patch_embed must stay exact."""
    return {**params, "blocks": _quantize_projections(params["blocks"])}


def quantize_gpt2_int8(params: Params) -> Params:
    """Return a copy of a GPT-2 param tree with the transformer matmul
    weights (attn c_attn/c_proj, mlp c_fc/c_proj) in int8 {"q","s"} form.
    Everything else (wte/wpe, layer norms, biases) is untouched."""
    return {**params, "h": _quantize_projections(params["h"])}


def _quantize_projections(blocks: Params) -> Params:
    """Copy a stacked block dict with every two-level ``{submodule: {name:
    {"w", "b"}}}`` matmul weight quantized, all other keys (layer norms,
    future additions) passed through untouched — rebuilding from a
    hardcoded key list would silently drop new keys and surface as a
    tree-structure mismatch deep inside ``lax.scan``."""
    out: Params = {}
    for key, sub in blocks.items():
        if isinstance(sub, dict) and all(
            isinstance(v, dict) and set(v) == {"w", "b"} for v in sub.values()
        ):
            out[key] = {name: {"w": quantize_linear(leaf["w"]), "b": leaf["b"]}
                        for name, leaf in sub.items()}
        else:
            out[key] = sub
    return out
