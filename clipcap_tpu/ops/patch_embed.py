"""Fused uint8 im2col + matmul patch embedding (Pallas) for the ViT front end.

The shipping patch-embed path (models/clip_vit.py::clip_encode_image) is
``images.astype(bf16)`` → 6-d reshape/transpose ``patchify`` → one matmul:
three HBM-visible stages over the pixel batch (uint8 read + bf16 write,
relayout read + write, matmul read).  The reference's equivalent is the
stride-``patch`` Conv2d inside ``clip.load``'s VisionTransformer
(/root/reference/clipcap/encoders/clip.py:112-129 hot path).

This kernel does the whole stage in ONE pass: the raw uint8 image rows are
DMA'd to VMEM (1 byte/pixel — half the bf16 traffic of the astype
intermediate), the im2col happens as *free* index arithmetic on the VMEM
block, and the patch matmul accumulates in fp32 on the MXU.

Layout trick that makes the im2col free
---------------------------------------
A row-major ``[B, H, W, 3]`` image reshapes (metadata-only) to
``[B, gh, P, gw, 3·P]``: pixel ``(gy·P+ph, gx·P+pw, c)`` lands at
``[b, gy, ph, gx, pw·3+c]``.  Slicing one patch-row index ``ph`` (a major
dim — no relayout) gives ``[G, gh, gw, 3P]``, whose leading dims merge into
the patch axis for free.  So with the weight rows permuted once at trace
time from the shipping ``(c, ph, pw)`` order into ``(ph, pw, c)`` order,
the patch embedding is a sum of ``P`` small matmuls

    out[b·N + gy·gw + gx, :] = Σ_ph  x_ph[...] @ W[ph]      (K = 3·P)

with every operand slice contiguous-or-major.  The pixel-normalization /
``/255`` fold from ``clip_encode_image`` composes unchanged (it rescales
weight rows and adds a bias — both happen outside the kernel).

The K=3·P contraction (42 for L/14, 96 for B/32) is far below the MXU's
128 lanes, so the matmuls run at reduced MXU efficiency — but the stage is
HBM/relayout-bound, not FLOP-bound, which is exactly what the kernel
attacks.  Measured verdict lives in docs/performance.md (VERDICT r4 #4).

Inference-path only (encoders are frozen; no VJP).  Interpret mode off-TPU.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


from clipcap_tpu.ops.layers import round_up as _rup


def _patch_kernel(img_ref, w_ref, b_ref, o_ref, *, compute_dtype):
    G, gh, P, gw, K = img_ref.shape
    D = w_ref.shape[-1]
    acc = None
    for ph in range(P):
        # Major-dim slice (no relayout), then merge leading dims into the
        # patch axis.  The merge happens on the f32 widening (8-row tiles:
        # gw is padded to a multiple of 8 by the caller, so the row-group
        # merge is a pure tile concatenation — Mosaic rejects the ragged
        # form).  No direct uint8→bf16 cast exists; widen via int32/f32
        # (exact for 0..255), round to the compute dtype after the merge.
        x = img_ref[:, :, ph, :, :]                         # [G, gh, gw, K]
        x = x.astype(jnp.int32).astype(jnp.float32)
        x = x.reshape(G * gh * gw, K).astype(compute_dtype)
        part = jnp.dot(x, w_ref[ph], preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc + b_ref[:].astype(jnp.float32)                # [1, D] broadcast
    o_ref[:] = acc.reshape(G, gh * gw, D).astype(o_ref.dtype)


def _group_size(B: int, gh: int, P: int, gw: int, K: int, D: int) -> Optional[int]:
    """Largest divisor of B whose buffers fit the VMEM budget (same padded
    sizing discipline as ops/attention._packed_group: sublane 16/32-mult,
    lane 128-mult; input double-buffered, weight resident)."""
    w_bytes = P * _rup(K, 16) * _rup(D, 128) * 2
    for g in (16, 8, 4, 2, 1):
        if B % g:
            continue
        img = 2 * g * gh * P * _rup(gw, 32) * _rup(K, 128)  # uint8, dbl-buf
        M = g * gh * gw
        acc = _rup(M, 8) * _rup(D, 128) * 4
        xbuf = 2 * _rup(M, 16) * _rup(K, 128) * 2           # slice + bf16 copy
        out = 2 * g * _rup(gh * gw, 16) * _rup(D, 128) * 2
        if w_bytes + img + acc + xbuf + out <= 12 * 1024 * 1024:
            return g
    return None


def patch_kernel_enabled() -> bool:
    """Opt-in switch for the fused patch-embed kernel
    (``CLIPCAP_PATCH_KERNEL=1``).  Default OFF: the measured in-network
    verdict (docs/performance.md) did not clear the shipping path."""
    env = os.environ.get("CLIPCAP_PATCH_KERNEL")
    if env is None:
        return False
    return env.lower() not in ("0", "false", "no", "off", "")


def patch_embed_supported(images: Array, patch: int) -> bool:
    """uint8 NHWC inputs whose geometry divides evenly (every CLIP preset)."""
    if images.ndim != 4 or images.dtype != jnp.uint8:
        return False
    B, H, W, C = images.shape
    return C == 3 and H % patch == 0 and W % patch == 0 and B >= 1


def patch_embed_fused(
    images: Array,        # [B, H, W, 3] uint8
    w: Array,             # [3·P·P, D] patch weight, shipping (c, ph, pw) rows
    bias: Optional[Array],  # [D] fold bias (or None)
    patch: int,
    *,
    out_dtype=jnp.bfloat16,
) -> Array:
    """One-pass uint8 im2col + patch matmul → ``[B, N, D]`` embeddings.

    Exact vs the shipping path up to fp32 summation order: both convert the
    same uint8 pixels to bf16 (integers ≤ 255 are exact in bf16), multiply
    by the same folded bf16 weights, and accumulate in fp32.
    """
    B, H, W, _ = images.shape
    gh, gw = H // patch, W // patch
    K = 3 * patch
    D = w.shape[-1]
    N = gh * gw

    # The in-kernel row merge needs the patches-per-row count on an 8-row
    # (f32 sublane) boundary; pad the image width with zero pixels when it
    # isn't (ViT-B/32: 7 → 8; B/16: 14 → 16) and drop the dead patches
    # after the kernel.  The pad is one uint8 pass; the dead patches add
    # gw_pad/gw - 1 (≤ +14%) matmul work.
    gw_pad = _rup(gw, 8)
    if gw_pad != gw:
        images = jnp.pad(images, ((0, 0), (0, 0),
                                  (0, (gw_pad - gw) * patch), (0, 0)))

    G = _group_size(B, gh, patch, gw_pad, K, D)
    if G is None:
        raise ValueError(f"patch_embed_fused: no group size fits VMEM for "
                         f"B={B} H={H} W={W} patch={patch} D={D}")

    # Weight rows (c, ph, pw) → (ph, pw, c), then [P, 3P, D].  A trace-time
    # pass over the 2.4M-param weight, like the normalization fold.
    idx = np.arange(3 * patch * patch).reshape(3, patch, patch)
    idx = idx.transpose(1, 2, 0).reshape(patch, K)          # [P, 3P] row ids
    w_ph = jnp.take(w, jnp.asarray(idx.reshape(-1)), axis=0)
    w_ph = w_ph.reshape(patch, K, D).astype(out_dtype)

    b = (jnp.zeros((1, D), jnp.float32) if bias is None
         else bias.reshape(1, D).astype(jnp.float32))

    x5 = images.reshape(B, gh, patch, gw_pad, K)            # metadata-only

    img_spec = pl.BlockSpec((G, gh, patch, gw_pad, K),
                            lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((patch, K, D), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G, gh * gw_pad, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_patch_kernel, compute_dtype=out_dtype),
        grid=(B // G,),
        in_specs=[img_spec, w_spec, b_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, gh * gw_pad, D), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(x5, w_ph, b)
    if gw_pad != gw:
        out = out.reshape(B, gh, gw_pad, D)[:, :, :gw].reshape(B, N, D)
    return out
