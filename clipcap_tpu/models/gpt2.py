"""GPT-2 decoder family, implemented TPU-first in pure JAX.

Capability parity with the reference's HF ``AutoModelForCausalLM`` usage
(/root/reference/clipcap/model/model.py:19 loads a GPT-2-family LM and calls
it with ``inputs_embeds`` + ``attention_mask``; the decode loops re-forward
the whole sequence every step, e.g. /root/reference/clipcap/inference/no_beam.py:38).

TPU-first differences from the reference:

* Parameters are a pytree with the *layer* dimension stacked on axis 0; the
  training-path transformer body is a single ``lax.scan`` — one compiled
  block instead of ``n_layer`` unrolled ones (faster compiles, natural remat
  boundary).
* Decoding uses a preallocated fixed-shape KV cache (per-layer buffers)
  updated in place with ``lax.dynamic_update_slice`` inside an *unrolled*
  layer loop — no growing ``inputs_embeds``, no dynamic shapes, and no
  per-step whole-cache copies (a scan-carried cache can't alias; measured
  2.5x slower per decode step on v5e).
* Beam search never physically reorders the cache: an ancestry table selects
  beam rows inside attention (``_cached_block``), so the per-step beam
  "gather" costs no HBM cache traffic at all.
* Compute dtype is configurable (bfloat16 for throughput on the MXU,
  float32 + ``Precision.HIGHEST`` for token-for-token parity runs).

Weight import from HF checkpoints lives in ``clipcap_tpu.models.hf_import``.
"""
from __future__ import annotations

import dataclasses
import os
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
    # Column layout of the packed c_attn weight/bias: "qkv" is the HF/export
    # layout (q | k | v, each head-major); "head" is the tensor-parallel
    # layout (for each head: q_h | k_h | v_h) — any contiguous split of the
    # packed dim is then head-aligned, so a ``model``-axis NamedSharding
    # partitions heads with zero resharding (parallel/tp.py).
    qkv_packing: str = "qkv"

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


from clipcap_tpu.ops.layers import round_up as _round_up


def _split_qkv(qkv: Array, cfg: GPT2Config) -> Tuple[Array, Array, Array]:
    """Unpack the fused c_attn output into q, k, v (each ``[..., D]``,
    head-major) for either packing layout (``GPT2Config.qkv_packing``).
    Both layouts yield IDENTICAL q/k/v tensors — "head" only permutes the
    packed dim so contiguous tensor-parallel shards stay head-aligned."""
    if cfg.qkv_packing == "head":
        *lead, _ = qkv.shape
        H, Dh = cfg.n_head, cfg.head_dim
        g = qkv.reshape(*lead, H, 3, Dh)
        return tuple(g[..., i, :].reshape(*lead, H * Dh) for i in range(3))
    return tuple(jnp.split(qkv, 3, axis=-1))


# Cache slot counts are padded to this quantum — the TPU sublane tile of
# the (slots, 128-lane) trailing dims — so the flash-decode kernel can
# always pick a tile-aligned u-tile that divides the buffer
# (ops/flash_decode._pick_u_tile).  Slots past the logical capacity are
# never written and always causally masked.
CACHE_SLOT_QUANTUM = 16


def _beam_cache_slots(n: int, quantum: int) -> int:
    """Slot count for a beam cache: ``n`` rounded up to ``quantum``, then —
    when that padding only admits a tiny flash u-tile (< 64 slots; more
    grid steps per pass) — to the next multiple of 128, which always
    divides into 128-slot tiles.  The padding is never written and always
    masked; the byte cost is at most 112 slots."""
    s = _round_up(n, quantum)
    best = 0
    for t in range(16, min(128, s) + 1, 16):
        if s % t == 0:
            best = t
    if best < 64:
        s = _round_up(n, 128)
    return s


def init_kv_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.bfloat16,
                  beam_size: Optional[int] = None, int8: bool = False,
                  prefix_slots: int = 0,
                  tile_major: Optional[bool] = None):
    """Preallocated fixed-shape KV cache, K and V **interleaved**.

    One buffer per layer, ``[batch, n_head, slots, 2*head_dim]`` — K in
    ``[..., :head_dim]``, V in ``[..., head_dim:]``.  Per-layer buffers
    (instead of one stacked ``[n_layer, ...]`` array) let XLA update each
    layer's slice **in place** inside the decode ``while_loop`` — a stacked
    cache forces a full-cache copy per step because the per-layer
    ``dynamic_update_slice`` can't alias through the layer loop (measured
    2.5x step-time difference on v5e).

    Why interleaved: GPT-2's head_dim is 64 but TPU arrays are tiled
    ``(sublane, 128)`` over their last two dims, so separate ``[..., T, 64]``
    K/V buffers are lane-padded to 128 — 2x the HBM footprint *and* 2x the
    read traffic on every decode step (gpt2-xl beam-5 at batch 64 OOMed a
    16 GB chip; decode is cache-read-bound).  With K|V sharing a 128-wide
    minor dim there is zero padding, and the flash decode kernel
    (``ops/flash_decode``) streams each cache byte exactly once per step.

    With ``beam_size`` K (rows grouped K-per-sample), the layout is
    ``[batch/K, n_head, slots, 2*head_dim]`` and **time-major**: row
    ``kb``'s cache slot for position ``t`` lives at flat index ``t*K + kb``.
    Time-major means (a) the slots written so far form a contiguous prefix,
    which lets the flash kernel bound its dynamic grid to the valid region
    (early decode steps stream a fraction of the cache — attention cost is
    proportional to contraction length, measured on v5e), and (b) the
    per-step K/V write for all K rows is ONE ``dynamic_update_slice``.
    The (sample, head) batch dims lead in both attention operands, so XLA's
    dot_general needs no physical cache transpose (the ``[B,H,T,Dh]`` view
    cost a full cache transpose per layer per step — measured 12x step-time
    blowup).

    With ``prefix_slots`` P > 0 (beam mode only), the buffer is a **folded
    prefix** cache: slots ``[0, P)`` hold the sample's prefix K/V ONCE
    (written by a beam_size-free prefill over ``[R, P, D]`` inputs), and
    the time-major live region starts at slot P — position ``t >= P``,
    row ``kb`` lives at ``P + (t-P)*K + kb``.  The prefix K/V is bitwise
    identical across beams by construction, so one copy serves all K:
    every decode step contracts ``P*(K-1)`` fewer slots and the buffer is
    ``P*(K-1)`` slots smaller than replicating it (the decode step is
    slot-count-bound — docs/performance.md).

    ``slots`` is ``max_len`` (or ``beam_size*max_len``) rounded up to
    ``CACHE_SLOT_QUANTUM`` so the kernel's u-tiles divide the buffer; the
    padding is never written and the causal masks hide it.

    ``tile_major`` (default: env ``CLIPCAP_CACHE_TILE_MAJOR``) stores the
    same cache as ``[batch, n_tiles, n_head, u_tile, 2*head_dim]`` — the
    kernel's u-tile becomes the major axis, so ONE grid step's per-row
    read (all heads x one u-tile) is a single CONTIGUOUS HBM chunk
    (~H*u_tile*256 bytes) instead of H strided u_tile-slices.  An A/B
    for the decode kernel's effective stream rate: the weight stream
    (XLA matmuls, MB-scale contiguous reads) measures ~860 GB/s on v5e
    while the strided cache stream measures ~315 — this layout tests
    whether descriptor granularity is the difference.  bf16 only; the
    consolidated/int8 forms keep the strided layout.
    """
    if tile_major is None:
        tile_major = os.environ.get("CLIPCAP_CACHE_TILE_MAJOR", "0") == "1"
    # int8 rows pack (32, 128) tiles — round their slots to the u-tile
    # maximum so the kernel's 128-slot tiles stay packing-aligned.
    quantum = 128 if int8 else CACHE_SLOT_QUANTUM
    if prefix_slots:
        assert beam_size is not None, "prefix_slots requires beam mode"
        slots = _beam_cache_slots(prefix_slots + beam_size * max_len, quantum)
        shape = (batch // beam_size, cfg.n_head, slots, 2 * cfg.head_dim)
    elif beam_size is not None:
        slots = _round_up(beam_size * max_len, quantum)
        shape = (batch // beam_size, cfg.n_head, slots, 2 * cfg.head_dim)
    else:
        slots = _round_up(max_len, quantum)
        shape = (batch, cfg.n_head, slots, 2 * cfg.head_dim)
    if int8:
        # Quantized cache: int8 K|V rows + per-(slot, head) fp32 absmax
        # scales for the K and V halves.  Decode attention is byte-rate
        # bound on the cache stream (docs/performance.md), so int8 halves
        # the dominant per-row cost.  The scales fold OUT of the MXU
        # operands algebraically: k-scales multiply the logits column
        # after the q·k dot, v-scales multiply the softmax weights before
        # the w·v dot — the dots run on scale-free tensors.
        return tuple(
            (jnp.zeros(shape, dtype=jnp.int8),
             jnp.zeros(shape[:3], dtype=jnp.float32),
             jnp.zeros(shape[:3], dtype=jnp.float32))
            for _ in range(cfg.n_layer)
        )
    if tile_major:
        from clipcap_tpu.ops.flash_decode import _pick_u_tile

        u_tile = _pick_u_tile(shape[2])
        shape = (shape[0], shape[2] // u_tile, cfg.n_head, u_tile,
                 2 * cfg.head_dim)
    return tuple(jnp.zeros(shape, dtype=dtype) for _ in range(cfg.n_layer))


def init_shared_kv(cfg: GPT2Config, groups: int, max_len: int,
                   dtype=jnp.bfloat16, int8: bool = False):
    """Consolidated shared-prefix cache for beam decode: ONE slot per
    position (slot ``t`` = position ``t``), vs the live beam cache's K.

    Beam search's surviving beams converge to common ancestors: after a few
    steps, all K beams' ancestry agrees on every old position, so those
    positions need one K/V row, not K.  ``consolidate_kv_cache`` gathers
    the converged prefix here; decode attention then streams ``c`` slots
    for the old region instead of ``c*K`` — the dominant per-row decode
    cost is the cache stream, so this is ~K× on the consolidated region
    (docs/performance.md).  Prefix positions (identical content in every
    beam row by construction of the prefill) are consolidatable from step
    one.

    Layout matches ``init_kv_cache``: ``[groups, n_head, slots, 2*head_dim]``
    interleaved K|V, slots padded to the u-tile quantum.
    """
    quantum = 128 if int8 else CACHE_SLOT_QUANTUM
    slots = _round_up(max_len, quantum)
    shape = (groups, cfg.n_head, slots, 2 * cfg.head_dim)
    if int8:
        return tuple(
            (jnp.zeros(shape, dtype=jnp.int8),
             jnp.zeros(shape[:3], dtype=jnp.float32),
             jnp.zeros(shape[:3], dtype=jnp.float32))
            for _ in range(cfg.n_layer)
        )
    return tuple(jnp.zeros(shape, dtype=dtype) for _ in range(cfg.n_layer))


def consolidate_kv_cache(kv_cache, shared_kv, rows: Array, beam_size: int,
                         base: int = 0):
    """Gather the converged beam prefix into the shared cache.

    ``rows``: [groups, W] int32 — for each sample group and position
    ``base + w``, the live-cache beam row holding the (converged) K/V:
    time-major live slot ``w*K + rows[r, w]``.  Positions beyond the
    converged length may carry arbitrary valid row indices — their
    gathered values are masked off by the shared-region mask until a later
    consolidation covers them.  ``base``: number of leading shared
    positions NOT represented in the live cache (the prefix, when it was
    prefilled straight into the shared buffer) — slots ``[0, base)`` are
    preserved as-is.

    Rewrites the gathered region of the shared buffer (idempotent for
    already-consolidated positions); the amortized cost is one
    shared-buffer-sized gather per consolidation interval.
    """
    K = beam_size
    R, W = rows.shape
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    idx = t_iota * K + jnp.clip(rows, 0, K - 1)          # [R, W] live slots

    # Gather as a one-hot MXU matmul: an XLA gather over the wide cache rows
    # lowers to the scalar core (measured ~0.8 s per consolidation on v5e —
    # dwarfing the decode it saves), while the one-hot contraction runs at
    # matmul rate (~1 ms).  Selection is exact in bf16: each output row sums
    # exactly one product x*1.  The per-(slot, head) int8 scales ride the
    # same contraction in fp32.
    onehot_cache: dict = {}

    def onehot(U, dt):
        key = (U, dt)
        if key not in onehot_cache:
            # Clamp (padded shared positions can index past the live
            # buffer; those slots are masked downstream).
            ixc = jnp.minimum(idx, U - 1)
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (R, W, U), 2)
            onehot_cache[key] = (ixc[:, :, None] == j_iota).astype(dt)
        return onehot_cache[key]

    def gather_rows(live, shared):
        oh = onehot(live.shape[2], jnp.bfloat16 if live.dtype == jnp.int8
                    else live.dtype)
        out = jnp.einsum("rtj,rhjd->rhtd", oh, live.astype(oh.dtype),
                         precision=jax.lax.Precision.HIGHEST)
        out = out.astype(live.dtype)  # int8 values <= 127 are exact in bf16
        if base:
            out = jnp.concatenate([shared[:, :, :base], out], axis=2)
        return out[:, :, :shared.shape[2]]

    def gather_scales(live, shared):
        out = jnp.einsum("rtj,rhj->rht", onehot(live.shape[2], live.dtype),
                         live, precision=jax.lax.Precision.HIGHEST)
        if base:
            out = jnp.concatenate([shared[:, :, :base], out], axis=2)
        return out[:, :, :shared.shape[2]]

    out = []
    for live, shared in zip(kv_cache, shared_kv):
        if isinstance(live, tuple):                       # int8: rows + scales
            out.append((gather_rows(live[0], shared[0]),
                        gather_scales(live[1], shared[1]),
                        gather_scales(live[2], shared[2])))
        else:
            out.append(gather_rows(live, shared))
    return tuple(out)


def _quantize_kv(new_kv: Array, Dh: int):
    """[..., slots, 2*Dh] bf16/f32 → (int8 rows, k-scales, v-scales) with
    per-(slot, head) symmetric absmax scales for each half."""
    kh, vh = new_kv[..., :Dh], new_kv[..., Dh:]
    kf, vf = kh.astype(jnp.float32), vh.astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-8) / 127.0
    sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), 1e-8) / 127.0
    q = jnp.concatenate(
        [jnp.clip(jnp.round(kf / sk[..., None]), -127, 127),
         jnp.clip(jnp.round(vf / sv[..., None]), -127, 127)], axis=-1
    ).astype(jnp.int8)
    return q, sk, sv


def _tm_slots(buf: Array) -> int:
    """Logical slot count of a tile-major cache buffer
    (``init_kv_cache(..., tile_major=True)``: [B, T, H, u_tile, 2*Dh])."""
    return buf.shape[1] * buf.shape[3]


def _tm_logical(buf: Array) -> Array:
    """[B, T, H, u, 2*Dh] → the logical [B, H, T*u, 2*Dh] view — a
    MATERIALIZING transpose, for the XLA-fallback/parity path only (the
    flash kernel reads the tile-major buffer natively)."""
    B, T, H, u, D2 = buf.shape
    return buf.transpose(0, 2, 1, 3, 4).reshape(B, H, T * u, D2)


def _tm_write(buf: Array, new_flat: Array, slot0) -> Array:
    """Write ``new_flat`` [B, H, S, 2*Dh] at logical slots
    [slot0, slot0+S) of a tile-major buffer: one single-slot in-place
    update per slot, since a run of S slots may straddle a u-tile
    boundary (slot s lives at tile s//u, offset s%u).  S is small — the
    K beam rows of one decode step, or the P prefix slots of the one
    prefill — so the unrolled updates stay cheap next to the cache read."""
    u = buf.shape[3]
    new_flat = new_flat.astype(buf.dtype)
    for s in range(new_flat.shape[2]):
        slot = slot0 + s
        row = jax.lax.dynamic_slice_in_dim(new_flat, s, 1, axis=2)
        buf = jax.lax.dynamic_update_slice(
            buf, row[:, None], (0, slot // u, 0, slot % u, 0))
    return buf


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


def _mlp(x: Array, layer: Params, cfg: GPT2Config, precision) -> Array:
    h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], cfg.layer_norm_epsilon)
    h = linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], precision)
    h = ACTIVATIONS[cfg.activation](h)
    h = linear(h, layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], precision)
    return x + h


def _cached_block(
    x: Array,
    layer: Params,
    ckv: Array,
    cache_index,
    bias: Optional[Array],
    cfg: GPT2Config,
    precision,
    beam_size: Optional[int] = None,
    ancestry: Optional[Array] = None,
    flash: bool = False,
    shared=None,
    shared_mask: Optional[Array] = None,
    shared_len=None,
    cache_base: int = 0,
) -> Tuple[Array, Array]:
    """One block in cached (prefill/decode) mode.

    ``ckv``: this layer's interleaved cache (see ``init_kv_cache``) —
    written in place at ``cache_index`` and attended over with batch dims
    leading in both einsum operands (no whole-cache transposes; those
    doubled decode step time).

    Prefill (S > 1) attends **within the block only** — q/k/v of the S new
    positions plus the causal/pad bias — so the zero-filled cache is never
    read.  Prefill therefore assumes ``cache_index == 0`` (full-context
    prefill, which is how the engine and beam search always call it).

    Decode (S == 1) attends over the written cache.  With ``flash=True``
    the masked softmax attention runs as one Pallas kernel pass over the
    interleaved buffer (``ops/flash_decode``), dynamically bounded to the
    ``cache_index+1`` written positions (time-major slots form a contiguous
    prefix) — each VALID cache byte is read exactly once and the padding
    tail is never touched.  The XLA fallback slices K and V from the full
    buffer (reads full 128-wide tiles twice — the layout keeps it no worse
    than the old padded split buffers, at half the memory).

    With ``beam_size`` K (rows grouped K-per-sample) attention implements
    the lazy (gather-free) beam reorder: rather than physically gathering
    the cache by source beam every step (the reference reorders its grown
    tensors, base.py:104-115 — as a cache gather on TPU that costs a full
    cache rewrite per step), rows stay where they were written and the
    precomputed ``ancestry`` mask (built once per step in ``gpt2_apply``)
    is -inf everywhere except the one row holding each position's K/V —
    softmax over the masked flat K·T context is then EXACTLY the
    per-position row selection.
    """
    B, S, D = x.shape
    H, Dh = cfg.n_head, cfg.head_dim
    scale = 1.0 / np.sqrt(Dh)

    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], cfg.layer_norm_epsilon)
    qkv = linear(h, layer["attn"]["c_attn"]["w"], layer["attn"]["c_attn"]["b"], precision)
    q, k, v = _split_qkv(qkv, cfg)

    int8kv = isinstance(ckv, tuple)
    if int8kv:
        ckv, csk, csv = ckv
    # 5-D buffer = tile-major layout (init_kv_cache ``tile_major``): the
    # flash kernel reads it natively; writes go slot-by-slot; the XLA
    # fallback transposes back to the logical [B, H, U, 2*Dh] view.
    tm = not int8kv and ckv.ndim == 5

    if beam_size is None:
        T = _tm_slots(ckv) if tm else ckv.shape[2]
        q = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)  # [B,H,S,Dh]
        k = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        new_kv = jnp.concatenate([k, v], axis=-1)
        if int8kv:
            q8, sk, sv = _quantize_kv(new_kv, Dh)
            ckv = jax.lax.dynamic_update_slice(ckv, q8, (0, 0, cache_index, 0))
            csk = jax.lax.dynamic_update_slice(csk, sk, (0, 0, cache_index))
            csv = jax.lax.dynamic_update_slice(csv, sv, (0, 0, cache_index))
        elif tm:
            ckv = _tm_write(ckv, new_kv, cache_index)
        else:
            ckv = jax.lax.dynamic_update_slice(
                ckv, new_kv.astype(ckv.dtype), (0, 0, cache_index, 0))

        if S > 1:
            # Prefill: block-local causal attention (cache never read).
            logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                                precision=precision) * scale
            logits = logits.astype(jnp.float32)
            if bias is not None:
                logits = logits + bias[..., :S]
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            attn = jnp.einsum("bhst,bhtd->bhsd", w, v, precision=precision)
        elif flash:
            from clipcap_tpu.ops.flash_decode import flash_decode

            mask = (bias[:, 0] if bias is not None
                    else jnp.zeros((1, 1, T), jnp.float32))  # [Bm, 1, T]
            attn = flash_decode(q, ckv, mask, u_valid=cache_index + 1,
                                scales=(csk, csv) if int8kv else None)
        else:
            src = _tm_logical(ckv) if tm else ckv
            if int8kv:
                kx = (src[..., :Dh].astype(jnp.float32)
                      * csk[..., None]).astype(x.dtype)
                vx = (src[..., Dh:].astype(jnp.float32)
                      * csv[..., None]).astype(x.dtype)
            else:
                kx = src[..., :Dh].astype(x.dtype)
                vx = src[..., Dh:].astype(x.dtype)
            logits = jnp.einsum("bhsd,bhtd->bhst", q, kx,
                                precision=precision) * scale
            logits = logits.astype(jnp.float32)
            if bias is not None:
                logits = logits + bias
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            attn = jnp.einsum("bhst,bhtd->bhsd", w, vx, precision=precision)
        attn_out = attn.transpose(0, 2, 1, 3).reshape(B, S, D)
    else:
        K = beam_size
        R = B // K
        assert bias is None or bias.shape[0] == 1, "beam mode: broadcast bias only"
        # [B,S,H*Dh] -> [R,H,K,S,Dh]
        qg = q.reshape(R, K, S, H, Dh).transpose(0, 3, 1, 2, 4)
        kg = k.reshape(R, K, S, H, Dh).transpose(0, 3, 1, 2, 4)
        vg = v.reshape(R, K, S, H, Dh).transpose(0, 3, 1, 2, 4)
        new_kv = jnp.concatenate([kg, vg], axis=-1)                    # [R,H,K,S,2Dh]
        # Time-major slots (t*K + kb): positions [cache_index, cache_index+S)
        # for all K rows are one contiguous slot range — ONE in-place update.
        new_flat = new_kv.transpose(0, 1, 3, 2, 4).reshape(R, H, S * K, 2 * Dh)
        # Live-region slot index: with ``cache_base`` P, the live region
        # holds only generated positions — position t sits at
        # (t - P)*K + kb, offset by P physical slots when the prefix is
        # FOLDED into the head of this same buffer (``shared`` None), or
        # by 0 when it lives in a separate shared buffer
        # (prefill-to-shared consolidation mode).
        live_index = cache_index - cache_base
        base_slot = cache_base if (shared is None and cache_base) else 0
        slot0 = base_slot + live_index * K
        if int8kv:
            q8, sk, sv = _quantize_kv(new_flat, Dh)
            ckv = jax.lax.dynamic_update_slice(ckv, q8, (0, 0, slot0, 0))
            csk = jax.lax.dynamic_update_slice(csk, sk, (0, 0, slot0))
            csv = jax.lax.dynamic_update_slice(csv, sv, (0, 0, slot0))
        elif tm:
            ckv = _tm_write(ckv, new_flat, slot0)
        else:
            ckv = jax.lax.dynamic_update_slice(
                ckv, new_flat.astype(ckv.dtype), (0, 0, slot0, 0)
            )

        if ancestry is None:
            # Prefill: block-local causal attention (batch dims r,h,k).
            la = jnp.einsum("rhksd,rhktd->rhkst", qg, kg,
                            precision=precision) * scale
            logits = la.astype(jnp.float32)
            if bias is not None:
                logits = logits + bias[0, 0, :, :S]       # [S,S] broadcast
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            attn = jnp.einsum("rhkst,rhktd->rhksd", w, vg, precision=precision)
            attn_out = attn.transpose(0, 2, 3, 1, 4).reshape(B, S, D)
        else:
            # Decode: flat-context masked attention over the K·T slots.
            # With a consolidated shared prefix (``shared`` + ``shared_len``
            # — see ``init_shared_kv``), attention is two-phase: the shared
            # region (1 slot/position, all beams see all of it) and the
            # live region starting at slot ``shared_len*K`` (the ancestry
            # mask already excludes consolidated positions), combined into
            # exactly one softmax by the online-softmax recurrence.
            assert S == 1
            q1 = qg[:, :, :, 0]                           # [R,H,K,Dh]
            sh_int8 = isinstance(shared, tuple)
            if sh_int8:
                shared, ssk, ssv = shared
            assert not (tm and shared is not None), (
                "tile-major cache does not compose with the consolidated "
                "shared-prefix form (beam.py pins tile_major=False there)")
            if flash:
                if shared is not None:
                    # Fused two-phase kernel: shared-prefix tiles then live
                    # tiles under ONE pallas_call — the online-softmax
                    # partials stay in VMEM scratch across the phases.  The
                    # composed two-call form (``carry=``/``return_carry=``)
                    # moved the [R,H,K,2*Dh] fp32 partials through HBM per
                    # layer per step, which MEASURED as a net loss vs no
                    # consolidation at all on v5e.
                    from clipcap_tpu.ops.flash_decode import (
                        flash_decode_two_phase,
                    )

                    R = q1.shape[0]
                    c_vec = jnp.broadcast_to(
                        jnp.asarray(shared_len, jnp.int32), (R,))
                    attn = flash_decode_two_phase(
                        q1, shared, shared_mask, ckv, ancestry,
                        sh_valid=c_vec,
                        lv_lo=(c_vec - cache_base) * K,
                        lv_valid=jnp.broadcast_to(
                            (live_index + 1) * K, (R,)).astype(jnp.int32),
                        shared_scales=(ssk, ssv) if sh_int8 else None,
                        live_scales=(csk, csv) if int8kv else None,
                    )
                else:
                    from clipcap_tpu.ops.flash_decode import flash_decode

                    attn = flash_decode(
                        q1, ckv, ancestry,
                        u_valid=base_slot + (live_index + 1) * K,
                        scales=(csk, csv) if int8kv else None)
            else:
                def deq(buf, sk, sv, is8):
                    if is8:
                        kx = (buf[..., :Dh].astype(jnp.float32)
                              * sk[..., None]).astype(x.dtype)
                        vx = (buf[..., Dh:].astype(jnp.float32)
                              * sv[..., None]).astype(x.dtype)
                        return kx, vx
                    return buf[..., :Dh].astype(x.dtype), buf[..., Dh:].astype(x.dtype)

                ku, vu = deq(_tm_logical(ckv) if tm else ckv,
                             csk if int8kv else None,
                             csv if int8kv else None, int8kv)
                la = jnp.einsum("rhkd,rhud->rhku", q1, ku,
                                precision=precision).astype(jnp.float32) * scale
                la = la + ancestry[:, None]               # ancestry: [R,K,U] mask
                if shared is not None:
                    ks, vs = deq(shared, ssk if sh_int8 else None,
                                 ssv if sh_int8 else None, sh_int8)
                    ls = jnp.einsum("rhkd,rhcd->rhkc", q1, ks,
                                    precision=precision).astype(jnp.float32) * scale
                    ls = ls + shared_mask[:, None]
                    la = jnp.concatenate([ls, la], axis=-1)
                    vu = jnp.concatenate([vs, vu], axis=2)
                w = jax.nn.softmax(la, axis=-1).astype(x.dtype)
                attn = jnp.einsum("rhku,rhud->rhkd", w, vu, precision=precision)
            attn_out = attn.transpose(0, 2, 1, 3).reshape(B, S, D)

    attn_out = linear(attn_out, layer["attn"]["c_proj"]["w"],
                      layer["attn"]["c_proj"]["b"], precision)
    x = x + attn_out
    new_cache = (ckv, csk, csv) if int8kv else ckv
    return _mlp(x, layer, cfg, precision), new_cache


def _block(
    x: Array,
    layer: Params,
    bias: Optional[Array],
    cfg: GPT2Config,
    precision,
) -> Array:
    """One transformer block, full-sequence (no cache). Used by the
    training-path ``lax.scan`` over stacked layer params."""
    B, S, D = x.shape
    H, Dh = cfg.n_head, cfg.head_dim

    h = layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"], cfg.layer_norm_epsilon)
    qkv = linear(h, layer["attn"]["c_attn"]["w"], layer["attn"]["c_attn"]["b"], precision)
    q, k, v = _split_qkv(qkv, cfg)
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, H, Dh)
    v = v.reshape(B, S, H, Dh)
    attn_out = _attention(q, k, v, bias, precision)
    attn_out = attn_out.reshape(B, S, D)
    attn_out = linear(attn_out, layer["attn"]["c_proj"]["w"], layer["attn"]["c_proj"]["b"], precision)
    x = x + attn_out

    h = layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"], cfg.layer_norm_epsilon)
    h = linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"], precision)
    h = ACTIVATIONS[cfg.activation](h)
    h = linear(h, layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"], precision)
    return x + h


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
    kv_cache=None,
    cache_index: Optional[Array] = None,
    dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    return_logits: bool = True,
    beam_size: Optional[int] = None,
    ancestry: Optional[Array] = None,
    flash: Optional[bool] = None,
    shared_kv=None,
    shared_len: Optional[Array] = None,
    cache_base: int = 0,
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
    * **Beam decode** (``beam_size`` K + ``ancestry`` [B, max_len] given,
      S=1 only): rows are grouped K-per-sample; ``ancestry[b, t] ∈ [0, K)``
      names the group row holding beam b's K/V for position t.  This is the
      lazy (gather-free) beam reorder — see ``_cached_block``.  With
      ``shared_kv`` (per-layer consolidated buffers from ``init_shared_kv``)
      + ``shared_len`` c (traced scalar, or per-group [R] vector so each
      sample's own converged length bounds its stream), positions ``t < c``
      are served from the shared buffer (1 slot per position) and excluded
      from the live ancestry mask; attention is the two-phase
      online-softmax merge.  ``cache_base`` P > 0 declares that the live
      region stores only positions ``t >= P`` and ``ancestry`` is indexed
      by generated position ``t - P``.  WITH ``shared_kv`` the prefix
      lives in the shared buffer (prefill-to-shared consolidation);
      WITHOUT it, ``cache_base`` means a **folded prefix** — slots
      ``[0, P)`` of the main cache hold the prefix once, visible to all
      beams, and the live region starts at physical slot P
      (``init_kv_cache(..., prefix_slots=P)``).

    ``flash``: use the Pallas flash-decode kernel for cached single-token
    attention (``ops/flash_decode`` — one pass over the interleaved cache).
    Default ``None`` auto-enables it for the serving configuration (bf16
    compute, default precision, cache dtype == compute dtype, on TPU); the
    XLA path remains the reference for fp32/parity runs.

    Returns ``(logits_or_hidden, new_kv_cache)``.
    """
    if inputs_embeds is None:
        inputs_embeds = embed(params["wte"], input_ids, dtype)
    x = inputs_embeds.astype(dtype)
    B, S, D = x.shape

    if kv_cache is not None:
        # Interleaved cache [.., slots, 2*Dh]; slots are padded to the
        # flash u-tile quantum (init_kv_cache) — padding is causally masked.
        # int8 caches are (rows, k-scales, v-scales) tuples per layer.
        _buf0 = kv_cache[0][0] if isinstance(kv_cache[0], tuple) else kv_cache[0]
        slots = _tm_slots(_buf0) if _buf0.ndim == 5 else _buf0.shape[2]
        offset = cache_index
        if S > 1:
            # Cached prefill attends block-locally (the zero-filled cache is
            # never read), which is only correct for a FULL-context prefill.
            # A chunked second prefill at cache_index > 0 would silently
            # drop the earlier context — reject it when the index is
            # concrete (traced indices can't be checked at trace time; the
            # engine and beam search always prefill at 0).
            try:
                ci_concrete = int(cache_index)
            except (TypeError, jax.errors.TracerIntegerConversionError,
                    jax.errors.ConcretizationTypeError):
                ci_concrete = None
            if ci_concrete is not None and ci_concrete != 0:
                raise ValueError(
                    "cached prefill (S > 1) requires cache_index == 0: "
                    "prefill attention is block-local and ignores earlier "
                    f"cache contents (got cache_index={ci_concrete})"
                )
        # Beam mode: the causal bias is only consulted block-locally during
        # prefill (decode uses the ancestry mask), so S columns suffice.
        T = S if beam_size is not None else slots
    else:
        offset = 0
        T = S

    positions = offset + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    x = x + jnp.take(params["wpe"], positions, axis=0).astype(dtype).reshape(1, S, D)

    bias = causal_bias(S, T, offset)
    if attention_mask is not None:
        if attention_mask.shape[-1] < T:
            # Mask given over the logical capacity; cache slots are padded
            # to the u-tile quantum — padded slots are invalid.
            attention_mask = jnp.pad(
                attention_mask, ((0, 0), (0, T - attention_mask.shape[-1]))
            )
        pad_bias = jnp.where(attention_mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
        bias = bias + pad_bias[:, None, None, :]

    if kv_cache is not None:
        if flash is None:
            import os

            flash = (
                S == 1
                and jax.default_backend() == "tpu"
                and (
                    os.environ.get("CLIPCAP_FORCE_FLASH") == "1"
                    or (
                        dtype == jnp.bfloat16
                        and _buf0.dtype in (dtype, jnp.int8)
                        and precision is None
                        and os.environ.get("CLIPCAP_DISABLE_FLASH") != "1"
                    )
                )
            )
        beam_mask = None
        shared_mask = None
        if ancestry is not None:
            # Build the flat-context beam selection mask ONCE per step (all
            # layers share it): [R, K, slots] fp32, 0 where time-major slot
            # ``t*K + j`` (row j, position t) holds beam k's K/V and t is
            # causally visible, else -inf.
            assert beam_size is not None and S == 1
            K = beam_size
            R = B // K
            Tl = ancestry.shape[1]                     # logical capacity
            # Folded-prefix layout (cache_base P without a separate shared
            # buffer): slots [0, P) hold the one shared prefix copy —
            # visible to every beam — and the time-major live region
            # starts at slot P.
            fold = cache_base if shared_kv is None else 0
            anc = jnp.repeat(ancestry.reshape(R, K, Tl), K, axis=-1)
            pad = (fold, slots - fold - K * Tl)
            if any(pad):                # prefix head + u-tile padding tail
                anc = jnp.pad(anc, ((0, 0), (0, 0), pad),
                              constant_values=-1)      # never matches a row
            s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, slots), 2)
            s_rel = jnp.maximum(s_iota - fold, 0)      # live-region slot
            pos = cache_base + s_rel // K              # absolute position
            visible = jnp.logical_and(anc == s_rel % K, pos <= offset)
            if fold:
                visible = jnp.logical_or(visible, s_iota < fold)
            if shared_kv is not None:
                # Consolidated positions are served from the shared buffer;
                # exclude them here so the two phases partition the context.
                # shared_len may be per-group [R] — broadcast over (K, slot).
                c_vec = jnp.asarray(shared_len, jnp.int32)
                c3 = (c_vec.reshape(R, 1, 1) if c_vec.ndim else
                      c_vec.reshape(1, 1, 1))
                visible = jnp.logical_and(visible, pos >= c3)
                _sbuf0 = (shared_kv[0][0] if isinstance(shared_kv[0], tuple)
                          else shared_kv[0])
                sc_slots = _sbuf0.shape[2]
                c_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, sc_slots), 2)
                shared_mask = jnp.where(c_iota < c3, 0.0,
                                        NEG_INF).astype(jnp.float32)
                shared_mask = jnp.broadcast_to(
                    shared_mask, (c3.shape[0], K, sc_slots))
            beam_mask = jnp.where(visible, 0.0, NEG_INF).astype(jnp.float32)

        # Unrolled layer loop with per-layer cache buffers: each layer's
        # dynamic_update_slice aliases its buffer in place across the decode
        # while_loop (a scan-carried stacked cache copies the whole cache
        # every step — 2.5x slower per step measured on v5e).
        new_cache = []
        h = x
        for l in range(cfg.n_layer):
            layer = jax.tree_util.tree_map(lambda p: p[l], params["h"])
            h, ckv = _cached_block(
                h, layer, kv_cache[l], cache_index,
                None if beam_mask is not None else bias,
                cfg, precision, beam_size=beam_size, ancestry=beam_mask,
                flash=bool(flash),
                shared=None if shared_kv is None else shared_kv[l],
                shared_mask=shared_mask, shared_len=shared_len,
                cache_base=cache_base,
            )
            new_cache.append(ckv)
        x = h
        new_cache = tuple(new_cache)
    else:
        block = partial(_block, cfg=cfg, precision=precision)
        if remat:
            block = jax.checkpoint(block, static_argnums=())

        def scan_fn(carry, layer):
            h = block(carry, layer, bias)
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
