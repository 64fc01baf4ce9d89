"""Flash-decoding attention kernel for the KV-cached token loop.

Why this exists (measured on TPU v5e, gpt2-xl beam-5 serving):

* GPT-2's head dim is 64, but TPU arrays are tiled ``(sublane, 128)`` on
  their last two dims — a ``[..., T, 64]`` K or V cache buffer is physically
  padded to 128 lanes, **doubling** both its HBM footprint (batch 64 beam-5
  gpt2-xl OOMed a 16 GB chip at 17.4 GB) and every read of it.  The decode
  loop reads the whole cache every step, so cache reads are the dominant
  HBM traffic after the weights themselves.
* Decode attention cost scales with the *contraction length* (measured:
  per-block time is insensitive to rows-per-block G but proportional to
  slots U — both the cache DMA and the MXU contraction cycles grow with U).
  A fixed-shape kernel therefore pays for the FULL preallocated context on
  every step, even though step ``t`` can only see ``t + prefix`` positions
  — for the 67-token beam-5 serving config that's ~1.75x the necessary
  attention work on average.

The fix is a cache layout + a dynamically bounded kernel:

* K and V live **interleaved** in one buffer ``[..., U, 2*Dh]`` whose minor
  dim is exactly 128 for Dh=64 — zero lane padding (`models/gpt2.py
  init_kv_cache`).  Beam caches are **time-major**: the slot for (beam row
  kb, position t) is ``t*K + kb``, so the slots written so far form a
  contiguous prefix of the buffer (and the per-step K/V write is ONE
  ``dynamic_update_slice`` instead of K).
* The kernel runs a 2-D grid ``(row_blocks, u_tiles)`` where the number of
  u-tiles is a **traced scalar** — Mosaic's dynamic-grid support turns it
  into a runtime loop bound.  The u-tile is the largest sublane-aligned
  divisor of the buffer ≤ 128 slots (``_pick_u_tile``), and each decode
  step contracts only ``ceil(u_valid / u_tile)`` tiles, where ``u_valid``
  is the number of slots written so far: early steps stream a fraction of
  the cache instead of all of it.  Tiles combine with the standard flash
  online-softmax recurrence carried in VMEM scratch.  An int8 cache form
  (``scales``) halves cache memory; its measured speed verdict is in the
  ``flash_decode`` docstring.

Semantics match the XLA decode path in ``models/gpt2.py::_cached_block``:
fp32 logits + additive mask (the beam ancestry/causal mask), fp32 softmax
(computed online), value contraction in the compute dtype accumulated in
fp32.  Slots of the final partial tile beyond ``u_valid`` are covered by
the causal/ancestry mask, never by implicit bounds.  Off-TPU the kernel
runs in Pallas interpret mode so CPU tests exercise the identical path.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Upper bound on cache slots per u-tile (the actual tile is the largest
# sublane-aligned divisor of the buffer ≤ this — ``_pick_u_tile``): small
# enough for tight dynamic bounds, big enough for well-shaped DMAs.
# Overridable for on-hardware tuning.  The full sweep over the folded
# 384-slot beam buffer's aligned divisors (gpt2-xl batch 96, v5e):
# 48 → 54.5, **64 → 55.1**, 96 → 53.7, 128 → 52.5 captions/s — the curve
# peaks at 64 (tight dynamic bound, still a well-shaped DMA); gpt2 base
# at batch 128 agrees (432 vs 424 at 96).  Buffers without a divisor near
# 64 (e.g. the 400-slot replicated layout) pick the closest (80) either
# way.
_U_TILE = int(_os.environ.get("CLIPCAP_FLASH_U_TILE", 64))
# A tuning override must stay sweepable on every shape: the <=128-slot
# single-tile shortcut below only applies when the env knob is unset.
_U_TILE_OVERRIDDEN = "CLIPCAP_FLASH_U_TILE" in _os.environ
_SUBLANE = 16  # sublane tile of the (slots, lanes) trailing dims


def _pick_u_tile(U: int, cap: int | None = None) -> int:
    """Largest sublane-aligned divisor of ``U`` that is ≤ ``cap``
    (default ``_U_TILE``); falls back to ``U`` itself (single tile) for
    unaligned tiny buffers.

    Under the DEFAULT cap, buffers that already fit one 128-slot tile never
    split: the dynamic grid can save at most fractional tiles there while
    every split pays per-tile overhead.  Measured on the K=1 sampling shape
    (U=80, batch 512, v5e): single 80-slot tile 266 captions/s vs 252 under
    the 64 cap (whose only aligned divisor of 80 is 16 — five tiny tiles).
    An EXPLICIT ``cap`` is always honored — the two-phase consolidation
    kernel caps its shared/live regions deliberately (its per-step dynamic
    bounds depend on the split), so the single-tile rule must not override
    it."""
    default = cap is None
    if default:
        cap = _U_TILE
        if U <= 128 and not _U_TILE_OVERRIDDEN:
            return U
    best = 0
    for t in range(_SUBLANE, min(cap, U) + 1, _SUBLANE):
        if U % t == 0:
            best = t
    if not default and best == 0:
        # Explicit caps below the first aligned divisor (e.g. cap 8 with
        # _SUBLANE=16) cannot be met exactly: take the SMALLEST aligned
        # divisor above the cap so the region still splits into bounded
        # tiles instead of silently degrading to one whole-buffer tile.
        start = (cap // _SUBLANE + 1) * _SUBLANE
        for t in range(start, U + 1, _SUBLANE):
            if U % t == 0:
                return t
    if default and best < max(_SUBLANE, cap // 2):
        # No divisor near the cap (e.g. the 400-slot replicated beam layout
        # under the 64 cap would land on 16-slot tiles): take the smallest
        # aligned divisor ABOVE the cap instead — a slightly fat well-shaped
        # tile beats a shower of tiny ones.
        # First sublane multiple strictly above the cap — the cap itself may
        # be unaligned (an env override like 40), and every candidate must
        # honor the aligned-divisor contract.
        start = (cap // _SUBLANE + 1) * _SUBLANE
        for t in range(start, U + 1, _SUBLANE):
            if U % t == 0:
                return t
    return best if best else U


# Target VMEM residency per kv tile (double-buffered by the pipeline).
_BLOCK_BYTES_TARGET = float(_os.environ.get("CLIPCAP_FLASH_BLOCK_MB", 2.5)) * 2 ** 20


def _row_block(R: int, H: int, u_tile: int, Dh: int, itemsize: int,
               max_rows: int | None = None) -> int:
    """Rows per grid step: biggest divisor of R whose kv tile fits the VMEM
    target (at least 1).  ``max_rows`` caps it — per-block dynamic bounds
    are min/max over the block's rows, so smaller blocks track per-sample
    converged lengths more tightly."""
    per_row = H * u_tile * 2 * Dh * itemsize
    g = max(1, int(_BLOCK_BYTES_TARGET // max(1, per_row)))
    g = min(g, R)
    if max_rows is not None:
        g = min(g, max_rows)
    while R % g:
        g -= 1
    return g


def _flash_update(q, kv, mask_tile, m_old, l_old, acc_old, *, scale: float,
                  qdtype, sk=None, sv=None):
    """One u-tile of the online-softmax (flash) recurrence — the ONE
    numerically sensitive core shared by all three kernels (``_kernel``,
    ``_fused_kernel``, ``_manual_kernel``); functional in/out so both the
    ref-mutating and loop-carry kernels wrap it.

    q:  [G*H, K, 2*Dh] zero-padded queries; kv: [G*H, UT, 2*Dh]
    interleaved tile (int8 rows pre-widening when ``sk`` is given);
    mask_tile: [Gm, K, UT] fp32 additive; m_old/l_old: [G, H, K] f32;
    acc_old: [G, H, K, 2*Dh] f32; sk/sv: [G, H, UT] per-slot int8 k/v
    scales or None.  Returns (m_new, l_new, acc_new).

    The kv tile is used UNSLICED in both dots (see ``_kernel``'s docstring
    for the layout argument); masks use the finite NEG_INF so max(logits)
    stays finite and the -inf init needs no special cases."""
    G, H, K = m_old.shape
    UT = kv.shape[1]
    if sk is not None:
        kv = kv.astype(qdtype)
    # [G*H, K, UT] fp32: batch dim (gh), contract the full 128 lanes.
    logits = jax.lax.dot_general(
        q, kv, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    logits = logits.reshape(G, H, K, UT)
    if sk is not None:
        logits = logits * sk[:, :, None, :]
    logits = logits + mask_tile[:, None]

    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1))
    alpha = jnp.exp(m_old - m_new)
    w = jnp.exp(logits - m_new[..., None])          # [G, H, K, UT]
    l_new = l_old * alpha + jnp.sum(w, axis=-1)
    if sv is not None:
        w = w * sv[:, :, None, :]
    wv = jax.lax.dot_general(
        w.reshape(G * H, K, UT).astype(qdtype), kv,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, H, K, acc_old.shape[-1])
    acc_new = acc_old * alpha[..., None] + wv
    return m_new, l_new, acc_new


def _kernel(b_ref, q_ref, kv_ref, mask_ref, *rest, scale: float, Dh: int,
            int8: bool = False, carry_in: bool = False,
            carry_out: bool = False):
    """One (row-block, u-tile) grid step.

    b_ref:    [2*NB] int32 scalar-prefetch — per-row-block tile bounds:
              ``b[r]`` = first tile, ``b[NB+r]`` = one-past-last tile of
              block ``r``'s valid range.  Grid step ``u`` of block ``r``
              reads physical tile ``min(b[r]+u, b[NB+r]-1)`` (the index
              maps apply this), so steps beyond the block's range repeat
              the last tile — Mosaic elides the DMA for an unchanged block
              index — and skip their compute via ``pl.when``.  This gives
              PER-BLOCK dynamic ranges under one global (dynamic) grid:
              each block streams only its own valid tiles even when blocks'
              converged prefixes differ (consolidated beam decode).
    q_ref:    [G, H, K, 2*Dh] (query zero-padded over the V half)
    kv_ref:   [G, H, UT, 2*Dh] interleaved cache tile (bf16/f32, or int8
              rows when ``int8`` — then ``rest`` leads with the per-slot
              k/v scale tiles ``sk_ref, sv_ref: [G, 1, H, UT]`` f32)
    mask_ref: [Gm, 1, K, UT] fp32 additive (tile-major host layout — the
              leading 1 selects this u-tile; Mosaic requires the last two
              block dims be tile-divisible or span the array, which the
              tile-major reshape satisfies for any sublane-aligned UT)
    Then, in order: with ``carry_in``, init partials ``m0, l0, acc0``
    ([G,H,K], [G,H,K], [G,H,K,2*Dh] f32) from an earlier phase; the
    outputs — either ``out [G,H,K,Dh]`` (written on the last u-tile) or,
    with ``carry_out``, the running partials ``m, l, acc`` themselves;
    finally scratch ``m/l [G,H,K]`` f32 and ``acc [G,H,K,2*Dh]`` f32.

    ``carry_in``/``carry_out`` exist for two-phase attention over a cache
    split into a consolidated shared-prefix region and a live beam region
    (``models/gpt2.py``): phase A emits its online-softmax partials, phase
    B resumes from them — the flash recurrence makes the two passes
    exactly one softmax.

    The interleaved tile is used UNSLICED in both dots — an in-kernel
    ``[..., :Dh]`` lane-slice forces Mosaic to repack the whole block into
    a new (padded) layout, which costs more than the attention itself:

    * logits: ``q_pad · kv^T`` — the V half of each row multiplies q's zero
      padding, so the result is exactly ``q · k`` (contraction over 128
      lanes, natural layout).
    * values: ``w · kv`` — columns [Dh:] are exactly ``w · v``; the K-half
      columns are discarded at the final output write.

    int8 mode keeps the dots scale-free: the widened int values are exact
    in bf16 (|q| ≤ 127), the k-scales multiply the logits COLUMNS after
    the q·k dot, and the v-scales fold into the softmax weights before the
    w·v dot.
    """
    if int8:
        sk_ref, sv_ref, *rest = rest
    if carry_in:
        m0_ref, l0_ref, acc0_ref, *rest = rest
    if carry_out:
        mo_ref, lo_out_ref, acco_ref, m_ref, l_ref, acc_ref = rest
    else:
        out_ref, m_ref, l_ref, acc_ref = rest
    r = pl.program_id(0)
    u = pl.program_id(1)
    n_u = pl.num_programs(1)
    nb = pl.num_programs(0)
    active = u < b_ref[nb + r] - b_ref[r]
    G, H, K, _ = q_ref.shape

    @pl.when(u == 0)
    def _init():
        if carry_in:
            m_ref[:] = m0_ref[:]
            l_ref[:] = l0_ref[:]
            acc_ref[:] = acc0_ref[:]
        else:
            m_ref[:] = jnp.full(m_ref.shape, -jnp.inf, m_ref.dtype)
            l_ref[:] = jnp.zeros(l_ref.shape, l_ref.dtype)
            acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    @pl.when(active)
    def _accumulate():
        UT = kv_ref.shape[-2]
        # Merge the leading (G, H) dims: layout-free (tiling is on the last
        # two dims) and Mosaic's matmul supports at most ONE batch dim.
        # A 5-D kv_ref is the TILE-MAJOR cache ([G, 1, H, UT, 2*Dh] — one
        # contiguous HBM chunk per row, see init_kv_cache); the reshape
        # drops the singleton tile dim, same element order either way.
        m_new, l_new, acc_new = _flash_update(
            q_ref[:].reshape(G * H, K, 2 * Dh),
            kv_ref[:].reshape(G * H, UT, 2 * Dh),
            mask_ref[:, 0], m_ref[:], l_ref[:], acc_ref[:],
            scale=scale, qdtype=q_ref.dtype,
            sk=sk_ref[:, 0] if int8 else None,
            sv=sv_ref[:, 0] if int8 else None)
        m_ref[:] = m_new
        l_ref[:] = l_new
        acc_ref[:] = acc_new

    @pl.when(u == n_u - 1)
    def _finish():
        if carry_out:
            mo_ref[:] = m_ref[:]
            lo_out_ref[:] = l_ref[:]
            acco_ref[:] = acc_ref[:]
        else:
            denom = jnp.maximum(l_ref[:], 1e-30)[..., None]
            out_ref[:] = (acc_ref[:] / denom)[..., Dh:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("u_tile", "interpret",
                                             "carry_out", "max_block_rows"))
def _flash_call(q_pad: Array, kv: Array, mask: Array,
                lo_t: Array, hi_t: Array,
                u_tile: int, interpret: bool, scales=None, carry=None,
                carry_out: bool = False, max_block_rows: int | None = None):
    """``lo_t``/``hi_t``: per-GROUP first / one-past-last valid u-tile
    ([R] int32).  Blocks of G groups share bounds (min lo, max hi) — the
    per-group masks keep exactness; the per-block bounds keep the DMA
    stream proportional to each block's own valid range."""
    R, H, K, Dh2 = q_pad.shape
    Dh = Dh2 // 2
    Rm = mask.shape[0]
    scale = 1.0 / np.sqrt(Dh)
    G = _row_block(R, H, u_tile, Dh, kv.dtype.itemsize, max_block_rows)
    int8 = scales is not None

    tile_major = kv.ndim == 5             # [R, n_tiles, H, u_tile, 2*Dh]
    n_tiles = kv.shape[1] if tile_major else kv.shape[2] // u_tile
    nb = R // G
    lo_b = jnp.min(lo_t.reshape(nb, G), axis=1)
    hi_b = jnp.max(hi_t.reshape(nb, G), axis=1)
    hi_b = jnp.maximum(hi_b, lo_b + 1)
    n_u = jnp.max(hi_b - lo_b)
    # Scalar-prefetch bounds [2*nb]: b[r] = lo, b[nb+r] = hi for block r.
    # Grid step u of block r reads physical tile min(lo+u, hi-1): steps
    # past the range repeat the last tile (DMA elided) and skip compute.
    b_arr = jnp.concatenate([lo_b, hi_b]).astype(jnp.int32)

    def tile_ix(r, u, b):
        return jnp.minimum(b[r] + u, b[nb + r] - 1)

    if tile_major:
        # One T-index slice of the [R, T, H, u_tile, 2*Dh] parent: each
        # row's (H, u_tile, 2*Dh) chunk is CONTIGUOUS in HBM — the DMA is
        # G fat chunks instead of G*H strided u_tile-slices.
        kv_spec = pl.BlockSpec((G, 1, H, u_tile, 2 * Dh),
                               lambda r, u, b: (r, tile_ix(r, u, b), 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        kv_spec = pl.BlockSpec((G, H, u_tile, 2 * Dh),
                               lambda r, u, b: (r, 0, tile_ix(r, u, b), 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((G, H, K, 2 * Dh), lambda r, u, b: (r, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        kv_spec,
        # Tile-major mask [Rm, n_tiles, K, UT]: the last two block dims
        # span the array, satisfying Mosaic's tiling rule for any UT.
        pl.BlockSpec((G if Rm > 1 else 1, 1, K, u_tile),
                     (lambda r, u, b: (r, tile_ix(r, u, b), 0, 0)) if Rm > 1
                     else (lambda r, u, b: (0, tile_ix(r, u, b), 0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    mask4 = mask.reshape(Rm, K, n_tiles, u_tile).transpose(0, 2, 1, 3)
    operands = [q_pad, kv, mask4]
    if int8:
        for s in scales:
            in_specs.append(pl.BlockSpec((G, 1, H, u_tile),
                                         lambda r, u, b: (r, tile_ix(r, u, b), 0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(
                s.reshape(R, H, n_tiles, u_tile).transpose(0, 2, 1, 3))
    if carry is not None:
        part_specs = [
            pl.BlockSpec((G, H, K), lambda r, u, b: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, K), lambda r, u, b: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, K, 2 * Dh), lambda r, u, b: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        in_specs.extend(part_specs)
        operands.extend(carry)

    if carry_out:
        out_specs = [
            pl.BlockSpec((G, H, K), lambda r, u, b: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, K), lambda r, u, b: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, K, 2 * Dh), lambda r, u, b: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((R, H, K), jnp.float32),
            jax.ShapeDtypeStruct((R, H, K), jnp.float32),
            jax.ShapeDtypeStruct((R, H, K, 2 * Dh), jnp.float32),
        ]
    else:
        out_specs = pl.BlockSpec((G, H, K, Dh), lambda r, u, b: (r, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((R, H, K, Dh), q_pad.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, n_u),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((G, H, K), jnp.float32),
            pltpu.VMEM((G, H, K), jnp.float32),
            pltpu.VMEM((G, H, K, 2 * Dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, Dh=Dh, int8=int8,
                          carry_in=carry is not None, carry_out=carry_out),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(b_arr, *operands)


def flash_decode(q: Array, kv: Array, mask: Array,
                 u_valid: Array | int | None = None,
                 interpret: bool | None = None,
                 scales=None,
                 u_lo: Array | int | None = None,
                 carry=None,
                 return_carry: bool = False,
                 u_tile: int | None = None,
                 max_block_rows: int | None = None,
                 manual: bool | None = None):
    """One decode step of masked attention over an interleaved KV cache.

    q:    [R, H, K, Dh]   — this step's queries (K beams per group; K=1 for
                            plain batched sampling).
    kv:   [R, H, U, 2*Dh] — interleaved cache, K in ``[..., :Dh]``,
                            V in ``[..., Dh:]``.  Beam caches are
                            time-major: slot ``t*K + kb``.  May be int8
                            rows (see ``scales``).
    mask: [Rm, K, U] fp32 additive (0 = visible, -inf/NEG_INF = hidden),
          Rm ∈ {1, R} (1 broadcasts across rows — the plain causal case).
    u_valid: slots written so far (traced scalar, or a per-group [R]
          vector) — the kernel contracts only ``ceil(u_valid / U_TILE)``
          tiles (per row-block: the max over its groups).  Slots of the
          last partial tile beyond ``u_valid`` MUST be masked by ``mask``
          (the causal / ancestry masks guarantee this).  ``None`` → the
          full buffer.
    scales: for an int8 ``kv``: ``(sk, sv)`` per-(slot, head) fp32 absmax
          scales, each ``[R, H, U]`` (``models/gpt2.py::_quantize_kv``).
          Halves the cache MEMORY; measured slightly slower than bf16 on
          v5e (the in-kernel widening outweighs the DMA saving — the
          kernel is pipeline-bound, not byte-bound), so it is an opt-in
          for memory-constrained serving, not a throughput knob.
    u_lo: first valid slot (traced scalar or per-group [R] vector) — the
          contraction starts at tile ``u_lo // U_TILE`` (per row-block:
          the min over its groups).  Slots of that tile BELOW ``u_lo``
          must be masked by ``mask`` (the consolidated-region exclusion in
          the beam mask guarantees this).  Used by two-phase
          consolidated-beam attention to skip the region already served by
          the shared prefix (``models/gpt2.py``); per-group values let each
          sample's own converged length bound its stream.
    carry: ``(m, l, acc)`` online-softmax partials from an earlier phase
          ([R,H,K], [R,H,K], [R,H,K,2*Dh] f32) — this call's recurrence
          resumes from them instead of (-inf, 0, 0).
    return_carry: return the partials ``(m, l, acc)`` instead of the
          normalized output, for a later phase to consume via ``carry``.
    → [R, H, K, Dh] in q's dtype, or the ``(m, l, acc)`` partials.
    """
    R, H, K, Dh = q.shape
    if kv.ndim == 5:
        # Tile-major cache [R, n_tiles, H, u_tile, 2*Dh] (init_kv_cache
        # tile_major mode): the tile size is baked into the layout.
        assert scales is None and carry is None and not return_carry, (
            "tile-major cache: int8/two-phase forms not supported")
        u_tile = kv.shape[3]
        U = kv.shape[1] * u_tile
    else:
        U = kv.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if kv.ndim != 5 and (u_tile is None or U % u_tile or u_tile % _SUBLANE):
        u_tile = _pick_u_tile(U)
    max_t = U // u_tile
    if u_valid is None:
        hi = jnp.full((R,), max_t, jnp.int32)
    else:
        hi = jnp.clip(pl.cdiv(jnp.asarray(u_valid, jnp.int32), u_tile),
                      1, max_t)
        hi = jnp.broadcast_to(hi, (R,)) if hi.ndim == 0 else hi
    if u_lo is None:
        lo = jnp.zeros((R,), jnp.int32)
    else:
        lo = jnp.asarray(u_lo, jnp.int32) // u_tile
        lo = jnp.broadcast_to(lo, (R,)) if lo.ndim == 0 else lo
        lo = jnp.clip(lo, 0, hi - 1)

    # Zero-pad q over the V half so the kernel can use the interleaved
    # cache tile unsliced (see _kernel docstring).  q is tiny.
    q_pad = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    Rm = mask.shape[0]
    mask = mask if Rm > 1 else jnp.broadcast_to(mask, (1, K, U))
    if manual is None:
        manual = _os.environ.get("CLIPCAP_FLASH_MANUAL", "0") == "1"
    if manual and scales is None and carry is None and not return_carry:
        # Manual-pipeline form (see _manual_kernel): in-kernel tile loop
        # with explicit double-buffered DMA from the HBM-resident cache.
        return _manual_call(q_pad, kv, mask, lo, hi, u_tile, interpret,
                            max_block_rows=max_block_rows)
    return _flash_call(q_pad, kv, mask, lo, hi, u_tile, interpret,
                       scales=scales, carry=carry, carry_out=return_carry,
                       max_block_rows=max_block_rows)


def _manual_kernel(b_ref, q_ref, mask_ref, kv_hbm, out_ref, buf, sem,
                   *, scale: float, Dh: int, G: int, u_tile: int,
                   tile_major: bool, n_slots: int):
    """Manual-pipeline decode attention: ONE grid step per row block; the
    u-tile loop runs INSIDE the kernel over an HBM-resident cache with
    explicitly double-buffered ``make_async_copy`` DMAs (the paged-
    attention structure), instead of Mosaic's (row_block, u_tile) grid
    pipeline.

    Why: the auto-pipeline form measures an effective cache stream of
    ~315 GB/s on v5e while XLA's MB-scale weight reads hit ~860 — if the
    gap is per-grid-step pipeline overhead (bookkeeping + fixed DMA wait
    per (block, tile) step with only ~µs of compute to hide it), moving
    the tile walk in-kernel removes those boundaries: iteration ``t``
    starts tile ``t+1``'s DMA into the other buffer slot before waiting
    on its own, so the DMA engine always has a fetch in flight.

    b_ref:   [2*NB] int32 scalar prefetch — block r's [first, one-past-
             last) valid u-tile, exactly as ``_kernel``.
    q_ref:   [G, H, K, 2*Dh] VMEM (query, V-half zero-padded).
    mask_ref:[Gm, n_tiles, K, u_tile] VMEM — ALL tiles of the block's
             additive mask (tile-major, small).
    kv_hbm:  the FULL cache in ANY/HBM memory space — strided
             ``[R, H, U, 2*Dh]`` or tile-major ``[R, T, H, u_tile, 2*Dh]``
             (``tile_major``); tiles are DMA'd on demand.
    buf/sem: VMEM scratch [2, G, H, u_tile, 2*Dh] + 2 DMA semaphores.
    """
    r = pl.program_id(0)
    nb = pl.num_programs(0)
    lo = b_ref[r]
    n = b_ref[nb + r] - lo
    _, H, K, Dh2 = q_ref.shape

    def copy(t, slot):
        if tile_major:
            src = kv_hbm.at[pl.ds(r * G, G), lo + t]
        else:
            src = kv_hbm.at[pl.ds(r * G, G), :,
                            pl.ds((lo + t) * u_tile, u_tile)]
        return pltpu.make_async_copy(src, buf.at[slot], sem.at[slot])

    # Pre-start the first n_slots-1 fetches (depth-S buffering: iteration
    # t always has the next S-1 tiles' DMAs in flight).
    for k in range(n_slots - 1):
        @pl.when(k < n)
        def _prestart(k=k):
            copy(k, k).start()

    q = q_ref[:].reshape(G * H, K, Dh2)

    def body(t, carry):
        m_old, l_old, acc_old = carry
        slot = jax.lax.rem(t, n_slots)
        nxt = t + n_slots - 1

        @pl.when(nxt < n)
        def _prefetch():
            copy(nxt, jax.lax.rem(nxt, n_slots)).start()

        copy(t, slot).wait()
        # Both layouts land as [G, H, u_tile, 2*Dh] in the buffer slot.
        kv = buf[slot].reshape(G * H, u_tile, Dh2)
        mask_tile = mask_ref[:, pl.dslice(lo + t, 1)][:, 0]       # [Gm,K,UT]
        return _flash_update(q, kv, mask_tile, m_old, l_old, acc_old,
                             scale=scale, qdtype=q_ref.dtype)

    m0 = jnp.full((G, H, K), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((G, H, K), jnp.float32)
    acc0 = jnp.zeros((G, H, K, Dh2), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, acc0))
    denom = jnp.maximum(l, 1e-30)[..., None]
    out_ref[:] = (acc / denom)[..., Dh:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("u_tile", "interpret",
                                             "max_block_rows"))
def _manual_call(q_pad: Array, kv: Array, mask: Array,
                 lo_t: Array, hi_t: Array,
                 u_tile: int, interpret: bool,
                 max_block_rows: int | None = None):
    """Launch the manual-pipeline kernel (see ``_manual_kernel``)."""
    R, H, K, Dh2 = q_pad.shape
    Dh = Dh2 // 2
    Rm = mask.shape[0]
    scale = 1.0 / np.sqrt(Dh)
    G = _row_block(R, H, u_tile, Dh, kv.dtype.itemsize, max_block_rows)
    tile_major = kv.ndim == 5
    n_tiles = kv.shape[1] if tile_major else kv.shape[2] // u_tile
    nb = R // G
    lo_b = jnp.min(lo_t.reshape(nb, G), axis=1)
    hi_b = jnp.max(hi_t.reshape(nb, G), axis=1)
    hi_b = jnp.maximum(hi_b, lo_b + 1)
    b_arr = jnp.concatenate([lo_b, hi_b]).astype(jnp.int32)

    # Buffering depth (2 = classic double buffering); deeper keeps more
    # DMAs in flight to ride out latency jitter, at n_slots x the VMEM.
    n_slots = max(2, int(_os.environ.get("CLIPCAP_FLASH_MANUAL_SLOTS", 2)))

    mask4 = mask.reshape(Rm, K, n_tiles, u_tile).transpose(0, 2, 1, 3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((G, H, K, 2 * Dh), lambda r, b: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G if Rm > 1 else 1, n_tiles, K, u_tile),
                         (lambda r, b: (r, 0, 0, 0)) if Rm > 1
                         else (lambda r, b: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((G, H, K, Dh), lambda r, b: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, G, H, u_tile, 2 * Dh), kv.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_manual_kernel, scale=scale, Dh=Dh, G=G,
                          u_tile=u_tile, tile_major=tile_major,
                          n_slots=n_slots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, H, K, Dh), q_pad.dtype),
        interpret=interpret,
    )(b_arr, q_pad, mask4, kv)


def _fused_kernel(b_ref, q_ref, skv_ref, smask_ref, lkv_ref, lmask_ref,
                  *rest, scale: float, Dh: int, sh_int8: bool,
                  lv_int8: bool):
    """One (row-block, tile) step of the FUSED two-phase decode attention.

    The grid's tile dimension walks the shared-prefix region's tiles first,
    then the live beam region's tiles, for each row block; the online-
    softmax partials live in VMEM scratch across both phases, so nothing
    round-trips through HBM between them (the two-call ``carry`` form moved
    the ``[R,H,K,2*Dh]`` fp32 ``acc`` out and back per layer per step —
    measured as the dominant consolidation overhead on v5e).

    b_ref: [3*NB] int32 scalar prefetch — per row block ``r``:
      ``b[r]``      = number of valid shared tiles (phase A steps),
      ``b[nb+r]``   = first valid live tile,
      ``b[2nb+r]``  = number of valid live tiles.
    Grid step ``u`` of block ``r``: shared tile ``min(u, b[r]-1)`` and live
    tile ``b[nb+r] + clamp(u - b[r], 0, b[2nb+r]-1)`` — whichever phase
    ``u`` is outside repeats its previous block index (DMA elided) and
    contributes no compute (``pl.when``).  Blocks whose total tile count is
    below the (max) grid bound idle at the tail the same way.
    """
    if sh_int8:
        ssk_ref, ssv_ref, *rest = rest
    if lv_int8:
        lsk_ref, lsv_ref, *rest = rest
    out_ref, m_ref, l_ref, acc_ref = rest
    r = pl.program_id(0)
    u = pl.program_id(1)
    n_u = pl.num_programs(1)
    nb = pl.num_programs(0)
    sh_n = b_ref[r]
    lv_n = b_ref[2 * nb + r]
    G, H, K, _ = q_ref.shape

    @pl.when(u == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, -jnp.inf, m_ref.dtype)
        l_ref[:] = jnp.zeros(l_ref.shape, l_ref.dtype)
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def _accumulate(kv_ref, mask_ref, sk_ref, sv_ref, int8):
        UT = kv_ref.shape[2]
        m_new, l_new, acc_new = _flash_update(
            q_ref[:].reshape(G * H, K, 2 * Dh),
            kv_ref[:].reshape(G * H, UT, 2 * Dh),
            mask_ref[:, 0], m_ref[:], l_ref[:], acc_ref[:],
            scale=scale, qdtype=q_ref.dtype,
            sk=sk_ref[:, 0] if int8 else None,
            sv=sv_ref[:, 0] if int8 else None)
        m_ref[:] = m_new
        l_ref[:] = l_new
        acc_ref[:] = acc_new

    @pl.when(u < sh_n)
    def _phase_shared():
        _accumulate(skv_ref, smask_ref,
                    ssk_ref if sh_int8 else None,
                    ssv_ref if sh_int8 else None, sh_int8)

    @pl.when(jnp.logical_and(u >= sh_n, u < sh_n + lv_n))
    def _phase_live():
        _accumulate(lkv_ref, lmask_ref,
                    lsk_ref if lv_int8 else None,
                    lsv_ref if lv_int8 else None, lv_int8)

    @pl.when(u == n_u - 1)
    def _finish():
        denom = jnp.maximum(l_ref[:], 1e-30)[..., None]
        out_ref[:] = (acc_ref[:] / denom)[..., Dh:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ut_sh", "ut_lv", "interpret",
                                             "max_block_rows"))
def _fused_call(q_pad: Array, skv: Array, smask: Array, lkv: Array,
                lmask: Array, sh_hi_t: Array, lv_lo_t: Array, lv_hi_t: Array,
                ut_sh: int, ut_lv: int, interpret: bool,
                sh_scales=None, lv_scales=None,
                max_block_rows: int | None = None):
    R, H, K, Dh2 = q_pad.shape
    Dh = Dh2 // 2
    scale = 1.0 / np.sqrt(Dh)
    sh_int8 = sh_scales is not None
    lv_int8 = lv_scales is not None
    # One G for both operand streams: budget over the two tiles combined.
    G = _row_block(R, H, ut_sh + ut_lv, Dh, lkv.dtype.itemsize,
                   max_block_rows)
    nb = R // G

    n_sh_tiles = skv.shape[2] // ut_sh
    n_lv_tiles = lkv.shape[2] // ut_lv
    sh_n = jnp.max(sh_hi_t.reshape(nb, G), axis=1)           # [nb]
    lv_lo = jnp.min(lv_lo_t.reshape(nb, G), axis=1)
    lv_hi = jnp.max(lv_hi_t.reshape(nb, G), axis=1)
    lv_n = jnp.maximum(lv_hi - lv_lo, 1)
    n_u = jnp.max(sh_n + lv_n)
    b_arr = jnp.concatenate([sh_n, lv_lo, lv_n]).astype(jnp.int32)

    def sh_ix(r, u, b):
        return jnp.minimum(u, b[r] - 1)

    def lv_ix(r, u, b):
        rel = jnp.clip(u - b[r], 0, b[2 * nb + r] - 1)
        return b[nb + r] + rel

    in_specs = [
        pl.BlockSpec((G, H, K, 2 * Dh), lambda r, u, b: (r, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, H, ut_sh, 2 * Dh),
                     lambda r, u, b: (r, 0, sh_ix(r, u, b), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1, K, ut_sh),
                     lambda r, u, b: (r, sh_ix(r, u, b), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, H, ut_lv, 2 * Dh),
                     lambda r, u, b: (r, 0, lv_ix(r, u, b), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1, K, ut_lv),
                     lambda r, u, b: (r, lv_ix(r, u, b), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    smask4 = smask.reshape(R, K, n_sh_tiles, ut_sh).transpose(0, 2, 1, 3)
    lmask4 = lmask.reshape(R, K, n_lv_tiles, ut_lv).transpose(0, 2, 1, 3)
    operands = [q_pad, skv, smask4, lkv, lmask4]
    for scales, ut, ix, n_t in ((sh_scales, ut_sh, sh_ix, n_sh_tiles),
                                (lv_scales, ut_lv, lv_ix, n_lv_tiles)):
        if scales is not None:
            for s in scales:
                in_specs.append(pl.BlockSpec(
                    (G, 1, H, ut),
                    (lambda r, u, b, _ix=ix: (r, _ix(r, u, b), 0, 0)),
                    memory_space=pltpu.VMEM))
                operands.append(
                    s.reshape(R, H, n_t, ut).transpose(0, 2, 1, 3))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, n_u),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, H, K, Dh), lambda r, u, b: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, H, K), jnp.float32),
            pltpu.VMEM((G, H, K), jnp.float32),
            pltpu.VMEM((G, H, K, 2 * Dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale, Dh=Dh,
                          sh_int8=sh_int8, lv_int8=lv_int8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, H, K, Dh), q_pad.dtype),
        interpret=interpret,
    )(b_arr, *operands)


def flash_decode_two_phase(q: Array, shared: Array, shared_mask: Array,
                           live: Array, live_mask: Array,
                           sh_valid: Array, lv_lo: Array, lv_valid: Array,
                           shared_scales=None, live_scales=None,
                           ut_shared: int | None = None,
                           ut_live: int | None = None,
                           interpret: bool | None = None,
                           max_block_rows: int | None = None) -> Array:
    """Fused two-phase decode attention over a consolidated shared prefix
    plus the live beam region — ONE kernel, ONE softmax.

    q:           [R, H, K, Dh] this step's queries.
    shared:      [R, H, Us, 2*Dh] consolidated cache (1 slot/position); may
                 be int8 rows with ``shared_scales=(sk, sv)`` [R, H, Us].
    shared_mask: [R, K, Us] fp32 additive — NEG_INF beyond each sample's
                 consolidated length (and anywhere else to hide).
    live:        [R, H, Ul, 2*Dh] time-major live beam cache; optionally
                 int8 with ``live_scales``.
    live_mask:   [R, K, Ul] fp32 additive (ancestry mask; must also hide
                 the consolidated positions served by ``shared``).
    sh_valid:    [R] int32 — consolidated slots valid per sample (tiles
                 beyond are skipped; the mask covers sub-tile slop).
    lv_lo:       [R] int32 — first live slot still served by the live
                 region (the mask hides anything below inside its tile).
    lv_valid:    [R] int32 — one-past-last written live slot.
    → [R, H, K, Dh] in q's dtype.

    Exactness: identical set of unmasked (position, row) contributions as
    the composed two-call form; the online-softmax recurrence makes the
    phase boundary invisible up to fp summation order.
    """
    R, H, K, Dh = q.shape
    Us, Ul = shared.shape[2], live.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ut_shared is None or Us % ut_shared or ut_shared % _SUBLANE:
        ut_shared = _pick_u_tile(Us, cap=int(_os.environ.get(
            "CLIPCAP_FLASH_SHARED_TILE", 32)))
    if ut_live is None or Ul % ut_live or ut_live % _SUBLANE:
        ut_live = _pick_u_tile(Ul, cap=int(_os.environ.get(
            "CLIPCAP_FLASH_LIVE_TILE", 48)))

    max_sh = Us // ut_shared
    max_lv = Ul // ut_live
    sh_hi_t = jnp.clip(pl.cdiv(jnp.asarray(sh_valid, jnp.int32), ut_shared),
                       1, max_sh)
    sh_hi_t = jnp.broadcast_to(sh_hi_t, (R,)) if sh_hi_t.ndim == 0 else sh_hi_t
    lv_lo_t = jnp.clip(jnp.asarray(lv_lo, jnp.int32) // ut_live, 0, max_lv - 1)
    lv_lo_t = jnp.broadcast_to(lv_lo_t, (R,)) if lv_lo_t.ndim == 0 else lv_lo_t
    lv_hi_t = jnp.clip(pl.cdiv(jnp.asarray(lv_valid, jnp.int32), ut_live),
                       1, max_lv)
    lv_hi_t = jnp.broadcast_to(lv_hi_t, (R,)) if lv_hi_t.ndim == 0 else lv_hi_t
    lv_lo_t = jnp.minimum(lv_lo_t, lv_hi_t - 1)

    q_pad = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    # Per-R masks (a leading 1 broadcasts — e.g. a scalar shared_len).
    shared_mask = jnp.broadcast_to(shared_mask, (R, K, Us))
    live_mask = jnp.broadcast_to(live_mask, (R, K, Ul))
    if max_block_rows is None:
        env = _os.environ.get("CLIPCAP_FLASH_FUSED_ROWS")
        max_block_rows = int(env) if env else None
    return _fused_call(q_pad, shared, shared_mask, live, live_mask,
                       sh_hi_t, lv_lo_t, lv_hi_t, ut_shared, ut_live,
                       interpret, sh_scales=shared_scales,
                       lv_scales=live_scales,
                       max_block_rows=max_block_rows)
