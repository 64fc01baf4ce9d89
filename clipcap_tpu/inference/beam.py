"""Length-normalized beam search, matching the reference's idiosyncratic
semantics (/root/reference/clipcap/inference/base.py:55-132) token-for-token:

* first step: plain top-k over the softmax-log of the (temperature-scaled)
  logits, expanding the single prefix to ``beam_size`` rows (base.py:86-94);
* later steps: stopped beams contribute a single 0-logit continuation at
  token id 0 (base.py:96-98); live beams' lengths grow; candidates are
  ranked by ``(score_sum) / seq_length`` over the flattened beam·vocab
  table (base.py:99-102); state is gathered by candidate source beam
  (base.py:104-115); ``scores`` stores the *unnormalized* sum again
  (``avg * seq_len``, base.py:113);
* stop on the tokenizer's EOS (base.py:66 — unlike the '.' stop token used
  by the sampling decoders), final ranking by ``score / seq_length``.

TPU-native design (vs the reference's grow-and-reorder loop):

* every shape is static; the token loop is one ``lax.while_loop`` inside a
  single jitted XLA program;
* the KV cache is **never reordered**.  The reference reorders its grown
  tensors by source beam every step (base.py:104-115); as a TPU cache
  gather that would rewrite the full multi-GB cache per step (measured
  ~3x decode cost).  Instead a tiny ``[batch, K, T]`` int32 *ancestry*
  table records which physical row holds each beam's K/V per position, and
  attention selects rows lazily via a one-hot einsum (models/gpt2.py
  ``_cached_block``).  Only tokens/scores/lengths — a few KB — are gathered;
* ``beam_search_batched`` runs R independent searches natively batched in
  one program: decode is HBM-bound on LM weight reads, so batching
  amortizes them across samples.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from clipcap_tpu.models.gpt2 import (
    GPT2Config,
    consolidate_kv_cache,
    gpt2_apply,
    gpt2_embed_tokens,
    init_kv_cache,
    init_shared_kv,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BeamParams:
    beam_size: int = 5
    max_new_tokens: int = 67      # reference entry_length
    temperature: float = 1.0
    stop_token: int = 50256       # EOS (base.py:66)
    pad_token: int = 0
    # Serve with an int8 KV cache (per-slot absmax scales): halves the
    # decode-attention cache stream, which is byte-rate bound
    # (docs/performance.md).  Off by default — logits move by int8
    # rounding, so parity runs leave this unset.
    int8_kv: bool = False
    # Tile-major cache layout A/B (init_kv_cache ``tile_major``): one
    # contiguous HBM chunk per (row, u-tile) read instead of H strided
    # slices.  None → env CLIPCAP_CACHE_TILE_MAJOR.  Token-identical
    # either way; bf16 only (ignored under int8_kv/consolidation).
    tile_major: "bool | None" = None
    # Consolidate the converged beam prefix into a 1-slot-per-position
    # shared cache every this many steps (0 disables).  Surviving beams
    # share ancestors, so old positions collapse from K cache slots to 1.
    # Results are identical up to fp summation order (the excluded
    # duplicate slots contributed exactly 0 through the NEG_INF mask).
    # OFF by default: on v5e the decode-attention kernel is compute/
    # overhead-bound, not cache-stream-bound, so the byte saving does not
    # pay for the two-phase kernel's extra tiles + per-block bound
    # widening — every measured cadence/tile config (C∈{4,8,16,32},
    # shared tile 16/48/80, fused single-kernel form) lost 5-20% vs C=0
    # on both gpt2 and gpt2-xl (docs/performance.md).
    consolidate_every: int = 0
    # Store the prefix ONCE at the head of the beam cache (slots [0, P))
    # instead of replicating it per beam: the prefix K/V is bitwise
    # identical across beams, so one copy serves all K through the same
    # single-kernel attention pass — the prefill runs once per sample
    # (1/K the compute) and every decode step contracts P*(K-1) fewer
    # slots.  Exact by construction; off reproduces the round-2
    # replicated-prefix layout.
    fold_prefix: bool = True


class BeamResult(NamedTuple):
    tokens: Array       # [..., beam, max_new_tokens] int32 (includes stop token)
    seq_lengths: Array  # [..., beam] float32 (reference counts the stop token)
    scores: Array       # [..., beam] float32, length-normalized final scores


@partial(jax.jit, static_argnames=("cfg", "bp", "dtype", "precision", "flash"))
def beam_search_batched(
    params,
    cfg: GPT2Config,
    prefix_embeds: Array,  # [R, P, D] — one independent beam search per row
    bp: BeamParams,
    dtype=jnp.bfloat16,
    precision=None,
    flash: "bool | None" = None,
) -> BeamResult:
    """R independent reference-exact beam searches in ONE XLA program.

    ``flash``: per-call override of the decode-attention kernel choice
    (None = the gpt2_apply auto rule). Tensor-parallel serving pins
    ``flash=False`` — the Pallas kernel is a single-chip program; under a
    ``model``-sharded cache the XLA attention path partitions instead."""
    R, P, D = prefix_embeds.shape
    K = bp.beam_size
    N = bp.max_new_tokens
    B = R * K
    total = P + N
    t = bp.temperature if bp.temperature > 0 else 1.0

    C = bp.consolidate_every
    if C > 0:
        # Prefill-to-shared: the prefix is identical for every beam, so run
        # it ONCE per sample straight into the shared consolidated cache
        # (slot t = position t).  The live beam cache then holds only the
        # N generated positions (cache_base=P addressing) — 1/K the prefill
        # compute and K*P fewer live slots than replicating the prefix.
        shared = init_shared_kv(cfg, R, total, dtype=dtype, int8=bp.int8_kv)
        hidden0, shared = gpt2_apply(
            params, cfg, inputs_embeds=prefix_embeds.astype(dtype),
            kv_cache=shared, cache_index=jnp.int32(0), dtype=dtype,
            precision=precision, return_logits=False,
        )
        # Only the LAST prefill position feeds the first ranking — project
        # one row instead of materializing [R, P, vocab] logits.
        logits0 = jnp.dot(hidden0[:, -1],
                          params["wte"].T.astype(hidden0.dtype),
                          precision=precision)
        cache = init_kv_cache(cfg, B, N, dtype=dtype, beam_size=K,
                              int8=bp.int8_kv, tile_major=False)
        logp0 = jax.nn.log_softmax(
            logits0.astype(jnp.float32) / t, axis=-1)            # [R, V]
        anc_len = N
    elif bp.fold_prefix:
        # Folded-prefix path (default): the prefix K/V is identical across
        # beams, so store it ONCE at the head of the beam cache and
        # prefill it with one beam_size-free forward over [R, P, D] —
        # 1/K the prefill compute, and every decode step contracts
        # P*(K-1) fewer slots through the same single kernel pass.
        shared = None
        cache = init_kv_cache(cfg, B, N, dtype=dtype, beam_size=K,
                              int8=bp.int8_kv, prefix_slots=P,
                              tile_major=bp.tile_major)
        hidden0, cache = gpt2_apply(
            params, cfg, inputs_embeds=prefix_embeds.astype(dtype),
            kv_cache=cache, cache_index=jnp.int32(0), dtype=dtype,
            precision=precision, return_logits=False,
        )
        logits0 = jnp.dot(hidden0[:, -1],
                          params["wte"].T.astype(hidden0.dtype),
                          precision=precision)
        logp0 = jax.nn.log_softmax(
            logits0.astype(jnp.float32) / t, axis=-1)            # [R, V]
        anc_len = N
    else:
        # Round-2 replicated-prefix path: prefill all K rows per sample
        # with the (identical) prefix.  Redundant compute once, but it
        # leaves every row with its own valid prefix K/V so the ancestry
        # table can start as "own row" everywhere.  Kept as the parity
        # anchor for the folded layout (tests/test_decode.py).
        shared = None
        pe = jnp.repeat(prefix_embeds.astype(dtype), K, axis=0)  # [B, P, D]
        cache = init_kv_cache(cfg, B, total, dtype=dtype, beam_size=K,
                              int8=bp.int8_kv, tile_major=bp.tile_major)
        hidden0, cache = gpt2_apply(
            params, cfg, inputs_embeds=pe, kv_cache=cache,
            cache_index=jnp.int32(0), dtype=dtype, precision=precision,
            beam_size=K, return_logits=False,
        )
        # Only group-row 0's last position feeds the first ranking.
        h_last = hidden0.reshape(R, K, P, -1)[:, 0, -1]
        logits0 = jnp.dot(h_last, params["wte"].T.astype(h_last.dtype),
                          precision=precision)
        logp0 = jax.nn.log_softmax(
            logits0.astype(jnp.float32) / t, axis=-1)            # [R, V]
        anc_len = total
    V = logp0.shape[-1]
    scores0, first_tokens = jax.lax.top_k(logp0, K)          # [R, K]

    tokens = jnp.full((R, K, N), bp.pad_token, dtype=jnp.int32)
    tokens = tokens.at[:, :, 0].set(first_tokens.astype(jnp.int32))
    seq_lengths = jnp.ones((R, K), dtype=jnp.float32)
    has_stopped = first_tokens == bp.stop_token

    own_row = (jnp.arange(B, dtype=jnp.int32) % K)[:, None]  # [B, 1]
    # Ancestry indexes absolute positions (C=0) or generated positions
    # t - P (consolidated mode, matching the live cache's base-P slots).
    ancestry = jnp.broadcast_to(own_row, (B, anc_len))       # own row everywhere
    base = P if (C > 0 or bp.fold_prefix) else 0

    def cond(state):
        step = state[0]
        stopped = state[5]
        return jnp.logical_and(step < N, ~jnp.all(stopped))

    def body(state, shared=None, c=None):
        step, tokens, scores, seq_lengths, cache, stopped, ancestry = state

        # Forward the tokens chosen at step-1 (cache position P + step - 1).
        # Each beam writes its own row, so ancestry there is "own row".
        pos = P + step - 1
        ancestry = jax.lax.dynamic_update_slice(
            ancestry, own_row, (0, pos - base)
        )
        last_tok = jax.lax.dynamic_slice_in_dim(tokens, step - 1, 1, axis=2)
        emb = gpt2_embed_tokens(params, last_tok.reshape(B, 1), dtype)
        step_logits, new_cache = gpt2_apply(
            params, cfg, inputs_embeds=emb, kv_cache=cache, cache_index=pos,
            dtype=dtype, precision=precision, beam_size=K, ancestry=ancestry,
            shared_kv=shared, shared_len=c, cache_base=base, flash=flash,
        )
        # Candidate-based ranking — exact, but never materializes the fp32
        # [B, V] log-softmax (the reference ranks avg = (scores+logp)/len
        # over the full beam·vocab table, base.py:99-102).  Within one beam
        # row, avg ordering == raw-logit ordering (scores/len are per-row
        # constants and t > 0), so each joint top-K winner must already be
        # in its row's top-K by (logit desc, token asc) — lax.top_k's exact
        # tie order.  Rank the K·K survivors by (avg desc, flat-index asc),
        # the reference's tie rule, via a lexicographic sort.
        l = step_logits[:, 0]                                   # [B, V]
        top_l, top_v = jax.lax.top_k(l, K)                      # [B, K]
        lf = l.astype(jnp.float32) / t
        m = jnp.max(lf, axis=-1)
        lse = m + jnp.log(jnp.sum(jnp.exp(lf - m[:, None]), axis=-1))  # [B]
        logp_cand = (top_l.astype(jnp.float32) / t - lse[:, None]).reshape(R, K, K)
        cand_ids = top_v.astype(jnp.int32).reshape(R, K, K)

        # Stopped beams: only token 0 with additive score 0 (base.py:96-98).
        # Filler ids 1..K-1 mirror the reference's -inf tail in index order.
        filler_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
        frozen_vals = jnp.where(filler_ids == 0, 0.0, -jnp.inf)
        logp_cand = jnp.where(stopped[:, :, None], frozen_vals, logp_cand)
        cand_ids = jnp.where(stopped[:, :, None], filler_ids, cand_ids)

        seq_lengths = seq_lengths + (~stopped).astype(jnp.float32)  # base.py:100
        avg = (scores[:, :, None] + logp_cand) / seq_lengths[:, :, None]
        flat_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1) * V + cand_ids
        )
        neg, fidx = jax.lax.sort(
            (-avg.reshape(R, K * K),
             jnp.broadcast_to(flat_ids, (R, K, K)).reshape(R, K * K)),
            num_keys=2,
        )
        top_avg = -neg[:, :K]
        flat_idx = fidx[:, :K]
        src = (flat_idx // V).astype(jnp.int32)                     # [R, K]
        next_tok = (flat_idx % V).astype(jnp.int32)

        # Gather ONLY the small state by source beam; the cache stays put
        # and the ancestry table absorbs the reorder.
        tokens = jnp.take_along_axis(tokens, src[:, :, None], axis=1)
        tokens = tokens.at[:, :, step].set(next_tok)
        seq_lengths = jnp.take_along_axis(seq_lengths, src, axis=1)
        stopped = jnp.take_along_axis(stopped, src, axis=1)
        scores = top_avg * seq_lengths                               # base.py:113
        ancestry = jnp.take_along_axis(
            ancestry.reshape(R, K, anc_len), src[:, :, None], axis=1
        ).reshape(B, anc_len)

        stopped = jnp.logical_or(stopped, next_tok == bp.stop_token)
        return (step + 1, tokens, scores, seq_lengths, new_cache, stopped, ancestry)

    state = (jnp.int32(1), tokens, scores0, seq_lengths, cache, has_stopped, ancestry)

    if C > 0:
        # Chunked decode with converged-prefix consolidation: between
        # C-step inner loops, gather every generated position on which all
        # K beams' ancestry agrees into the shared 1-slot-per-position
        # cache (models/gpt2.py::init_shared_kv; the prefix is there from
        # the prefill).  The converged length c is PER SAMPLE — surviving
        # beams converge at different depths, and a single straggler would
        # otherwise pin the whole batch's consolidation (the flash kernel
        # takes per-row-block tile bounds).  Inside the chunk the shared
        # buffer and c are loop-invariant, so the per-layer cache updates
        # keep aliasing in place exactly as in the single-loop path.
        _sb0 = shared[0][0] if isinstance(shared[0], tuple) else shared[0]
        sc_slots = _sb0.shape[2]

        def outer_cond(ostate):
            st = ostate[0]
            return jnp.logical_and(st[0] < N, ~jnp.all(st[5]))

        def outer_body(ostate):
            st, shared, c = ostate
            step, _, _, _, cache, _, ancestry = st
            anc3 = ancestry.reshape(R, K, N)
            rows0 = anc3[:, 0]                             # [R, N]
            t_iota = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
            conv = jnp.all(anc3 == rows0[:, None, :], axis=1)
            conv = jnp.logical_and(conv, t_iota < step - 1)  # written only
            conv = jnp.concatenate(
                [conv, jnp.zeros((R, 1), bool)], axis=1)
            # ^ False sentinel: when every written position is converged,
            # argmin lands on this column and yields c = P + N (consolidate
            # everything); without it argmin of an all-True row returns 0.
            # Per-sample converged length (leading all-equal run).
            c = jnp.maximum(c, P + jnp.argmin(conv, axis=1).astype(jnp.int32))
            rows = jnp.pad(rows0, ((0, 0), (0, sc_slots - P - N)))
            shared = consolidate_kv_cache(cache, shared, rows, K, base=P)

            entry = step

            def inner_cond(s):
                return jnp.logical_and(
                    jnp.logical_and(s[0] < N, s[0] < entry + C),
                    ~jnp.all(s[5]))

            st = jax.lax.while_loop(
                inner_cond, lambda s: body(s, shared, c), st)
            return (st, shared, c)

        state, _, _ = jax.lax.while_loop(
            outer_cond, outer_body,
            (state, shared, jnp.full((R,), P, jnp.int32)))
    else:
        state = jax.lax.while_loop(cond, body, state)
    _, tokens, scores, seq_lengths, _, _, _ = state

    final_scores = scores / seq_lengths  # base.py:121
    return BeamResult(tokens=tokens, seq_lengths=seq_lengths, scores=final_scores)


@partial(jax.jit, static_argnames=("cfg", "bp", "dtype", "precision"))
def beam_search(
    params,
    cfg: GPT2Config,
    prefix_embeds: Array,  # [1, P, D] — reference asserts batch 1 (generate.py:19)
    bp: BeamParams,
    dtype=jnp.bfloat16,
    precision=None,
) -> BeamResult:
    """Single-sample beam search (reference API shape): R=1 batched call."""
    res = beam_search_batched.__wrapped__(
        params, cfg, prefix_embeds, bp, dtype=dtype, precision=precision
    )
    return BeamResult(
        tokens=res.tokens[0], seq_lengths=res.seq_lengths[0], scores=res.scores[0]
    )
