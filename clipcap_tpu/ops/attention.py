"""Fused scaled-dot-product attention (Pallas) for short sequences.

The encoder towers run attention over short token rows (CLIP ViT-B/32: 51
tokens; HTSAT windows: 64; ViT-L/14: 257).  This kernel keeps the
``[B, H, N, N]`` logits and softmax entirely in VMEM: HBM traffic is
read-q/k/v + write-out, nothing else.

Whole-row design (not flash-attention streaming): for N ≤ 512 the full
``[G, Np, Np]`` logits block fits comfortably in VMEM, so there is no need
for the online-softmax machinery — one MXU pass for q·kᵀ, an in-register
fp32 softmax, one MXU pass for the value product.  Block size over the
flattened batch·head axis is picked per Np to stay under the VMEM budget.

**Measured verdict (v5e, ViT-B/32, batch 512): the XLA einsum path is
FASTER in-network** (51 vs 64 ms per forward) — the layout work around the
opaque custom call (head transpose + pad to the lane grid) costs more than
the logits HBM round-trip it saves at these tiny row lengths.  The towers
therefore default to ``sdpa(..., fused=False)``; the kernel stays exported
(correctness-tested in tests/test_pallas.py) for longer-row use cases where
the trade flips.

Inference-path only (no custom VJP): used by the frozen encoder towers
(reference clip.py:112-129, clap.py:121 — encoders are never trained).
Falls back to interpret mode off-TPU so CPU tests exercise the same code.
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

_NEG = -1e9


def _sdpa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, causal):
    q = q_ref[:]                                    # [G, Np, Dh]
    logits = jax.lax.dot_general(
        q, k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                       # [G, Np, Np] — VMEM only
    Np = logits.shape[-1]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Np), 2)
    mask = kpos < n_valid
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (1, Np, 1), 1)
        mask = jnp.logical_and(mask, kpos <= qpos)
    logits = jnp.where(mask, logits, _NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[:] = jax.lax.dot_general(
        w, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _block_rows(n_pad: int, head_dim: int) -> int:
    # VMEM budget ~16 MB with double buffering: logits G·Np²·4B dominates.
    for g in (64, 32, 16, 8):
        logits = g * n_pad * n_pad * 4
        bufs = 8 * g * n_pad * head_dim * 2  # 4 buffers, double-buffered
        if logits + bufs <= 10 * 1024 * 1024:
            return g
    return 8


def fused_sdpa(
    q: Array,  # [B, H, N, Dh]
    k: Array,
    v: Array,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
) -> Array:
    """Fused attention over short rows; returns [B, H, N, Dh].

    Numerics: q·kᵀ on the MXU with fp32 accumulation, fp32 softmax, value
    product with fp32 accumulation — the same recipe as the XLA path in the
    towers, so results agree to bf16 rounding.
    """
    B, H, N, Dh = q.shape
    if N > 512:  # whole-row design caps out; callers keep the XLA path
        raise ValueError(f"fused_sdpa supports N<=512, got {N}")
    Np = max(64, ((N + 63) // 64) * 64)
    scale = Dh ** -0.5 if scale is None else scale

    def prep(x):
        x = x.reshape(B * H, N, Dh)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)
    X = B * H
    G = min(_block_rows(Np, Dh), X)
    spec = pl.BlockSpec((G, Np, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sdpa_kernel, scale=scale, n_valid=N, causal=causal),
        grid=(pl.cdiv(X, G),),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((X, Np, Dh), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    if Np != N:
        out = out[:, :N]
    return out.reshape(B, H, N, Dh)


def _packed_kernel(qkv_ref, o_ref, *, heads, scale, causal, n_valid):
    """Whole attention middle for one sample group, straight off the packed
    qkv projection: per-head lane slices, fp32 logits+softmax in VMEM, heads
    re-concatenated on lanes so the output feeds out_proj with no relayout."""
    qkv = qkv_ref[:]                                  # [G, N, 3D]
    G, N, threeD = qkv.shape
    D = threeD // 3
    Dh = D // heads
    mask = None
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    if n_valid < N:
        mask = kpos < n_valid
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
        cm = kpos <= qpos
        mask = cm if mask is None else jnp.logical_and(mask, cm)
    outs = []
    for h in range(heads):
        q = jax.lax.slice_in_dim(qkv, h * Dh, (h + 1) * Dh, axis=2)
        k = jax.lax.slice_in_dim(qkv, D + h * Dh, D + (h + 1) * Dh, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * D + h * Dh, 2 * D + (h + 1) * Dh,
                                 axis=2)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                     # [G, N, N] — VMEM only
        if mask is not None:
            logits = jnp.where(mask, logits, _NEG)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)
        outs.append(jax.lax.dot_general(
            w, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(qkv.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _packed_group(B: int, N: int, D: int, heads: int,
                  itemsize: int = 2) -> Optional[int]:
    """Largest sample-group size that divides B and fits the VMEM budget.

    Sizing is TILE-PADDED (sublane 8/16, lane 128) and assumes the worst
    case for the unrolled per-head loop: every head's fp32 logits / exp /
    weights / context stay live on the Mosaic stack at once.  The first
    naive estimate (unpadded, single-head liveness) picked G=8 for
    ViT-B/32 b512 and overflowed the 16 MiB scoped-vmem stack by 588 KiB
    on chip; this one picks G=4 there (~7.5 MiB)."""

    def rup(x, m):
        return ((x + m - 1) // m) * m

    Dh = D // heads
    for g in (16, 8, 4, 2, 1):
        if B % g:
            continue
        # itemsize: the input dtype's (2 for bf16; 4 under fp32 parity runs,
        # where every input-typed buffer doubles — review r4 finding).
        qkv_in = 2 * g * rup(N, 16) * rup(3 * D, 128) * itemsize  # dbl-buffered
        out = 2 * g * rup(N, 16) * rup(D, 128) * itemsize
        per_head = (2 * rup(N, 8) * rup(N, 128) * 4          # logits + exp (fp32)
                    + rup(N, 16) * rup(N, 128) * itemsize    # weights
                    + rup(N, 16) * rup(Dh, 128) * itemsize)  # head context
        if qkv_in + out + heads * g * per_head <= 12 * 1024 * 1024:
            return g
    return None


def _packed_stripe_kernel(q_ref, k_ref, v_ref, o_ref, *, sub, scale, causal,
                          n_valid):
    """Attention middle for one sample group and ONE 128-lane head stripe
    (``sub`` heads of width 128//sub).  The stripe variant exists for rows
    too long for the whole-row kernel's VMEM budget (ViT-L/14: 257 tokens):
    lane-blocked BlockSpecs hand each grid step only its own q/k/v stripes,
    so total HBM traffic is still read-qkv-once + write-out-once."""
    q2, k2, v2 = q_ref[:], k_ref[:], v_ref[:]         # [G, N, 128]
    G, N, _ = q2.shape
    dh = 128 // sub
    mask = None
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    if n_valid < N:
        mask = kpos < n_valid
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
        cm = kpos <= qpos
        mask = cm if mask is None else jnp.logical_and(mask, cm)
    outs = []
    for i in range(sub):
        q = jax.lax.slice_in_dim(q2, i * dh, (i + 1) * dh, axis=2)
        k = jax.lax.slice_in_dim(k2, i * dh, (i + 1) * dh, axis=2)
        v = jax.lax.slice_in_dim(v2, i * dh, (i + 1) * dh, axis=2)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, _NEG)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q2.dtype)
        outs.append(jax.lax.dot_general(
            w, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(q2.dtype))
    o_ref[:] = outs[0] if sub == 1 else jnp.concatenate(outs, axis=-1)


def _stripe_group(B: int, N: int, sub: int, itemsize: int = 2) -> Optional[int]:
    """Sample-group size for the stripe kernel (same padding/liveness
    discipline as _packed_group, but per 128-lane stripe)."""

    def rup(x, m):
        return ((x + m - 1) // m) * m

    for g in (8, 4, 2, 1):
        if B % g:
            continue
        bufs = 2 * 4 * g * rup(N, 16) * 128 * itemsize  # q/k/v/out dbl-buffered
        per_sub = (2 * rup(N, 8) * rup(N, 128) * 4
                   + rup(N, 16) * rup(N, 128) * itemsize
                   + rup(N, 16) * 128 * itemsize)
        if bufs + sub * g * per_sub <= 12 * 1024 * 1024:
            return g
    return None


def sdpa_packed(
    qkv: Array,  # [B, N, 3·H·Dh] — the in_proj output, q|k|v on lanes
    heads: int,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
) -> Array:
    """Fused attention middle over the PACKED qkv projection.

    Motivation (measured, ViT-B/32 batch 512 on v5e): the attention middle
    — head-split relayouts, the [B,H,N,N] logits HBM round-trips, softmax
    — costs ~2 ms/block on the XLA path, ~25 ms of a 55 ms forward, while
    its compulsory HBM traffic (read qkv once, write the context once) is
    <0.2 ms/batch.  The earlier whole-row kernel (``fused_sdpa``) lost
    in-network because callers had to transpose to head-major and pad
    around the opaque call; this form takes the in_proj output verbatim
    and returns [B, N, H·Dh] ready for out_proj, so the kernel boundary
    adds zero layout work.

    Returns the context tensor [B, N, H·Dh].  Falls back to ``sdpa`` via
    the caller when shapes don't fit (see ``_packed_group``).
    """
    B, N, threeD = qkv.shape
    D = threeD // 3
    Dh = D // heads
    assert D % heads == 0 and threeD == 3 * D
    s = Dh ** -0.5 if scale is None else scale
    interpret = jax.default_backend() != "tpu"

    # Form preference (measured, v5e): the STRIPE form — grid over 128-lane
    # head stripes with lane-blocked specs on the same packed array — is
    # neutral-or-better than the whole-row form everywhere it applies
    # (ViT-B/32 b512 ~+1%, B/16 b128 +6%, and it is the only form that fits
    # L/14's 257-token rows: 663 -> 855 embeds/s).  Whole-row remains for
    # shapes the stripe can't block (D not a multiple of 128, or Dh not a
    # divisor of 128) and via CLIPCAP_PACKED_FORM=row.
    form = os.environ.get("CLIPCAP_PACKED_FORM", "")  # "", "row", "stripe"
    if form != "row" and D % 128 == 0 and 128 % Dh == 0:
        sub = 128 // Dh                       # heads per stripe (1 or 2)
        stripes = D // 128
        Gs = _stripe_group(B, N, sub, qkv.dtype.itemsize)
        if Gs is not None:
            dq = pl.BlockSpec((Gs, N, 128), lambda b, j: (b, 0, j),
                              memory_space=pltpu.VMEM)
            dk = pl.BlockSpec((Gs, N, 128),
                              lambda b, j, _s=stripes: (b, 0, _s + j),
                              memory_space=pltpu.VMEM)
            dv = pl.BlockSpec((Gs, N, 128),
                              lambda b, j, _s=stripes: (b, 0, 2 * _s + j),
                              memory_space=pltpu.VMEM)
            do = pl.BlockSpec((Gs, N, 128), lambda b, j: (b, 0, j),
                              memory_space=pltpu.VMEM)
            return pl.pallas_call(
                functools.partial(_packed_stripe_kernel, sub=sub, scale=s,
                                  causal=causal, n_valid=N),
                grid=(B // Gs, stripes),
                in_specs=[dq, dk, dv],
                out_specs=do,
                out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
                interpret=interpret,
            )(qkv, qkv, qkv)

    if form != "stripe":
        G = _packed_group(B, N, D, heads, qkv.dtype.itemsize)
        if G is not None:
            spec_in = pl.BlockSpec((G, N, threeD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
            spec_out = pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.pallas_call(
                functools.partial(_packed_kernel, heads=heads, scale=s,
                                  causal=causal, n_valid=N),
                grid=(B // G,),
                in_specs=[spec_in],
                out_specs=spec_out,
                out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
                interpret=interpret,
            )(qkv)

    q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
    return sdpa(q, k, v, scale=scale, causal=causal, fused=False)


def sdpa(
    q: Array,  # [B, N, H, Dh] (heads in dim 2, as produced by qkv reshape)
    k: Array,
    v: Array,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    bias: Optional[Array] = None,
    fused: bool = True,
) -> Array:
    """Attention façade for the towers: picks the fused kernel when legal
    (no additive bias, short rows), else the XLA einsum path.  Returns
    [B, N, H·Dh]."""
    B, N, H, Dh = q.shape
    if fused and bias is None and N <= 512:
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        o = fused_sdpa(qt, kt, vt, scale=scale, causal=causal)
        return o.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)

    s = Dh ** -0.5 if scale is None else scale
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * s
    logits = logits.astype(jnp.float32)
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N, 1), 2)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, N), 3)
        logits = jnp.where(kpos <= qpos, logits, _NEG)
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(B, N, H * Dh)
