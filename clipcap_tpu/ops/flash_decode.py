"""Flash-decoding attention kernel for the KV-cached token loop.

Why this exists (measured on TPU v5e, gpt2-xl beam-5 serving):

* GPT-2's head dim is 64, but TPU arrays are tiled ``(sublane, 128)`` on
  their last two dims — a ``[..., T, 64]`` K or V cache buffer is physically
  padded to 128 lanes, **doubling** both its HBM footprint (batch 64 beam-5
  gpt2-xl OOMed a 16 GB chip at 17.4 GB) and every read of it.  The decode
  loop reads the whole cache every step, so cache reads are the dominant
  HBM traffic after the weights themselves.
* The XLA decode path needs two separate dots (q·K logits, weights·V), each
  streaming its padded operand from HBM.

The fix is a cache layout + a kernel:

* K and V live **interleaved** in one buffer ``[..., U, 2*Dh]`` whose minor
  dim is exactly 128 for Dh=64 — zero lane padding (`models/gpt2.py
  init_kv_cache`).
* This kernel performs the whole masked-softmax attention step with ONE
  pass over that buffer: each grid step DMAs a row-block of the cache into
  VMEM once and computes logits, softmax and the value contraction from
  VMEM.  Cache bytes are read exactly once per decode step — the
  speed-of-light for this op.

Semantics match the XLA decode path in ``models/gpt2.py::_cached_block``:
fp32 logits + additive mask (the beam ancestry/causal mask), fp32 softmax,
value contraction accumulated in fp32.  Off-TPU the kernel runs in Pallas
interpret mode so CPU tests exercise the identical code path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Target VMEM residency per cache block (double-buffered by the pipeline).
_BLOCK_BYTES_TARGET = 2.5 * 2 ** 20


def _row_block(R: int, H: int, U: int, Dh: int, itemsize: int) -> int:
    """Rows per grid step: biggest divisor of R whose cache block fits the
    VMEM target (at least 1)."""
    per_row = H * U * 2 * Dh * itemsize
    g = max(1, int(_BLOCK_BYTES_TARGET // max(1, per_row)))
    g = min(g, R)
    while R % g:
        g -= 1
    return g


def _kernel(q_ref, kv_ref, mask_ref, out_ref, *, scale: float, Dh: int):
    """q_ref: [G, H, K, 2*Dh] (query zero-padded over the V half),
    kv_ref: [G, H, U, 2*Dh] interleaved, mask_ref: [Gm, K, U] fp32,
    out_ref: [G, H, K, Dh].

    The interleaved block is used UNSLICED in both dots — an in-kernel
    ``[..., :Dh]`` lane-slice forces Mosaic to repack the whole block into a
    new (padded) layout, which costs more than the attention itself:

    * logits: ``q_pad · kv^T`` — the V half of each row multiplies q's zero
      padding, so the result is exactly ``q · k`` (contraction over 128
      lanes, natural layout).
    * values: ``w · kv`` — columns [Dh:] are exactly ``w · v``; the K-half
      columns are discarded at the output write.
    """
    G, H, K, _ = q_ref.shape
    U = kv_ref.shape[2]
    # Merge the leading (G, H) dims: layout-free (tiling is on the last two
    # dims) and Mosaic's matmul supports at most ONE batch dim.
    q = q_ref[:].reshape(G * H, K, 2 * Dh)
    kv = kv_ref[:].reshape(G * H, U, 2 * Dh)

    # [G*H, K, U] fp32: batch dim (gh), contract the full 128 lanes.
    logits = jax.lax.dot_general(
        q, kv, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    logits = logits.reshape(G, H, K, U) + mask_ref[:][:, None]  # mask: [G, K, U]

    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        w.reshape(G * H, K, U).astype(q.dtype), kv,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # [G*H, K, 2*Dh]
    out_ref[:] = out.reshape(G, H, K, 2 * Dh)[..., Dh:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode(q: Array, kv: Array, mask: Array, interpret: bool | None = None) -> Array:
    """One decode step of masked attention over an interleaved KV cache.

    q:    [R, H, K, Dh]   — this step's queries (K beams per group; K=1 for
                            plain batched sampling).
    kv:   [R, H, U, 2*Dh] — interleaved cache, K in ``[..., :Dh]``,
                            V in ``[..., Dh:]``.
    mask: [Rm, K, U] fp32 additive (0 = visible, -inf/NEG_INF = hidden),
          Rm ∈ {1, R} (1 broadcasts across rows — the plain causal case).
    → [R, H, K, Dh] in q's dtype.
    """
    R, H, K, Dh = q.shape
    U = kv.shape[2]
    Rm = mask.shape[0]
    scale = 1.0 / np.sqrt(Dh)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    G = _row_block(R, H, U, Dh, kv.dtype.itemsize)
    grid = (R // G,)

    # Zero-pad q over the V half so the kernel can use the interleaved
    # cache block unsliced (see _kernel docstring).  q is tiny.
    q_pad = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, Dh=Dh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, H, K, 2 * Dh), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, U, 2 * Dh), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G if Rm > 1 else 1, K, U),
                         (lambda r: (r, 0, 0)) if Rm > 1 else (lambda r: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, H, K, Dh), lambda r: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, H, K, Dh), q.dtype),
        interpret=interpret,
    )(q_pad, kv, mask if Rm > 1 else jnp.broadcast_to(mask, (1, K, U)))
