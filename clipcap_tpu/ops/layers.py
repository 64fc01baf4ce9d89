"""Core functional layers shared by every model in the framework.

TPU-first design notes
----------------------
All models in this framework are *pure functions over parameter pytrees*:
``params`` are nested dicts of ``jnp.ndarray`` and every forward is a
jit-able function.  There is no module system — this keeps the whole model
transparent to ``jax.jit`` / ``pjit`` / ``shard_map`` and makes sharding a
matter of annotating the pytree, not rewriting classes.

Parameters are stored in float32 ("param_dtype"); compute happens in a
configurable ``dtype`` (bfloat16 on TPU by default, float32 for parity
runs against the PyTorch reference).  Matmuls always get an explicit
``precision`` so parity tests can force ``HIGHEST``.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def round_up(n: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``n`` (tile/slot quantization)."""
    return (n + m - 1) // m * m


def gelu_new(x: Array) -> Array:
    """GPT-2's tanh-approximated GELU (HF ``gelu_new`` / ``NewGELUActivation``)."""
    c = math.sqrt(2.0 / math.pi)
    x3 = x * x * x
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x3)))


def quick_gelu(x: Array) -> Array:
    """OpenAI CLIP's QuickGELU: ``x * sigmoid(1.702 * x)``."""
    return x * jax.nn.sigmoid(1.702 * x)


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


ACTIVATIONS = {
    "gelu_new": gelu_new,
    "quick_gelu": quick_gelu,
    "gelu": jax.nn.gelu,
    "relu": relu,
}


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def layer_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    """LayerNorm over the trailing dim, computed in float32 for stability."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def linear(
    x: Array,
    w,
    b: Optional[Array] = None,
    precision: Optional[jax.lax.Precision] = None,
) -> Array:
    """``x @ w (+ b)`` with weights cast to the compute dtype of ``x``.

    ``w`` is stored ``[in, out]`` (same layout HF's GPT-2 ``Conv1D`` uses,
    so weight import is transpose-free).

    ``w`` may also be a quantized weight ``{"q": int8 [in, out], "s":
    float32 [out]}`` (per-output-channel absmax, see
    ``ops/quant.quantize_linear``): the int8 tensor streams from HBM at
    half the bf16 bytes — decode serving is weight-read-bound, so this is
    a direct step-time cut — and XLA fuses the widening convert into the
    matmul operand read.  The per-channel scale applies to the output
    (``x @ q·diag(s) == (x @ q)·s``).
    """
    if isinstance(w, dict):
        y = jnp.dot(x, w["q"].astype(x.dtype), precision=precision)
        y = y * w["s"].astype(y.dtype)
    else:
        y = jnp.dot(x, w.astype(x.dtype), precision=precision)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def embed(table: Array, ids: Array, dtype: jnp.dtype) -> Array:
    """Embedding lookup; output cast to compute dtype."""
    return jnp.take(table, ids, axis=0).astype(dtype)


# ---------------------------------------------------------------------------
# Initializers (numpy RNG on host — param init is not a hot path)
# ---------------------------------------------------------------------------


def normal_init(rng: np.random.Generator, shape, std: float = 0.02) -> jnp.ndarray:
    return jnp.asarray(rng.normal(0.0, std, size=shape).astype(np.float32))


def zeros_init(shape) -> jnp.ndarray:
    return jnp.zeros(shape, dtype=jnp.float32)


def ones_init(shape) -> jnp.ndarray:
    return jnp.ones(shape, dtype=jnp.float32)


def torch_linear_init(rng: np.random.Generator, in_dim: int, out_dim: int):
    """Match ``torch.nn.Linear`` default init (kaiming-uniform fan_in) so that
    randomly-initialized parity fixtures have comparable scales.

    Returns ``(w[in,out], b[out])``.
    """
    bound = 1.0 / math.sqrt(in_dim)
    w = rng.uniform(-math.sqrt(1.0 / in_dim) * math.sqrt(3.0),
                    math.sqrt(1.0 / in_dim) * math.sqrt(3.0),
                    size=(in_dim, out_dim))
    b = rng.uniform(-bound, bound, size=(out_dim,))
    return jnp.asarray(w.astype(np.float32)), jnp.asarray(b.astype(np.float32))
