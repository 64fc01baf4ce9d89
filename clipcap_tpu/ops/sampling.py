"""Logit processors and sampling primitives — batched, fixed-shape, jit-safe.

Functional parity with /root/reference/clipcap/inference/utils.py:5-48 and
the inline nucleus math in nucleus_sampling.py:44-56, re-designed for TPU:
everything operates on ``[B, V]`` logit batches with static shapes (the
reference versions are 1-D, in-place, and data-dependent).

Documented reference bug NOT reproduced (SURVEY.md §"bugs"):
``sentence_length_penalty_apply`` (utils.py:40-48) compares gathered logit
*values* to the stop-token *id* (``tok_logits == stop_token``), which is a
float-vs-index confusion and a near-no-op. We implement the documented
intent — scale the stop-token's logit by ``(current_length/desired_length)
* length_factor`` — and keep the same signature.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9
# Top-p prefilter window: a nucleus at top_p < 1 on a trained model fits in
# tens of candidates almost always; tokens past the window would have been
# cut regardless whenever the cutoff lands inside it.  lax.top_k cost grows
# LINEARLY with k on TPU (~0.09 ms per unit at [512, 50k] — k=1024 costs as
# much as a full sort), so the window is deliberately small.
_TOPP_PREFILTER = 128


def top_k_top_p_filter(logits: Array, top_k: int = 0, top_p: float = 0.0) -> Array:
    """Filter a ``[B, V]`` batch of logits with top-k then nucleus (top-p).

    Matches the reference helper (inference/utils.py:5-32) element-wise but
    batched: tokens outside the top-k, or past the smallest set whose
    cumulative probability exceeds ``top_p``, get ``-inf``-like mass.
    ``top_k``/``top_p`` are static (python) values; 0 / 0.0 disable them.
    """
    V = logits.shape[-1]
    out = logits

    if top_k and top_k > 0:
        k = min(int(top_k), V)
        # kth via a min-reduce, NOT a slice: XLA rewrites sliced top_k
        # outputs into a slow full-sort lowering (measured 36 vs 4.8 ms per
        # step on [512, 50k] v5e).
        kth = jnp.min(jax.lax.top_k(out, k)[0], axis=-1, keepdims=True)
        out = jnp.where(out < kth, NEG_INF, out)

    if top_p and 0.0 < top_p < 1.0:  # >= 1 keeps everything: no-op
        # Prefilter to the top _TOPP_PREFILTER logits instead of sorting the
        # full vocab (a [B, 50k] sort per decode step measured ~200 ms at
        # batch 512 — it dominated sampling decode).  Exact whenever the
        # nucleus cutoff lands inside the prefilter window: tokens past it
        # would have been removed regardless (their cumulative mass already
        # exceeds top_p), which holds for any non-degenerate model at
        # top_p < 1 and always when V <= _TOPP_PREFILTER.
        k = min(V, _TOPP_PREFILTER)
        top_vals, top_idx = jax.lax.top_k(out, k)  # sorted descending
        denom = jax.nn.logsumexp(out.astype(jnp.float32), axis=-1, keepdims=True)
        probs = jnp.exp(top_vals.astype(jnp.float32) - denom)
        cumprobs = jnp.cumsum(probs, axis=-1)
        # Shift right so the first token crossing the threshold survives
        # (reference utils.py:29-31).
        remove = cumprobs > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        kept_vals = jnp.where(remove, NEG_INF, top_vals)
        # Scatter the survivors back onto a -inf vocab row.
        B = out.shape[0]
        batch_idx = jax.lax.broadcasted_iota(jnp.int32, (B, k), 0)
        out = jnp.full_like(out, NEG_INF).at[batch_idx, top_idx].set(kept_vals)

    return out


def repetition_penalty_apply(
    logits: Array, tokens: Array, penalty: float, valid: Optional[Array] = None
) -> Array:
    """Penalize already-generated tokens (reference utils.py:34-38).

    ``logits``: [B, V]; ``tokens``: [B, T] fixed-size token buffer;
    ``valid``: [B, T] bool marking which buffer slots hold real tokens
    (fixed-shape replacement for the reference's growing token list).
    """
    B, T = tokens.shape
    gathered = jnp.take_along_axis(logits, tokens, axis=-1)  # [B, T]
    penalized = jnp.where(gathered < 0, gathered * penalty, gathered / penalty)
    if valid is not None:
        penalized = jnp.where(valid, penalized, gathered)
    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
    return logits.at[batch_idx, tokens].set(penalized)


def sentence_length_penalty_apply(
    logits: Array,
    stop_token: int,
    current_length: Array,
    desired_length: int,
    length_factor: float,
) -> Array:
    """Scale the stop token's logit by ``(len/desired)*factor`` so longer
    candidates increasingly prefer stopping (intended semantics of reference
    utils.py:40-48; see module docstring for the upstream bug)."""
    penalty = (current_length.astype(jnp.float32) / desired_length) * length_factor
    new_stop = logits[..., stop_token] * penalty
    return logits.at[..., stop_token].set(new_stop.astype(logits.dtype))


def nucleus_renormalize(logits: Array, top_k: int, top_p: float) -> Array:
    """The reference's batched nucleus construction
    (nucleus_sampling.py:44-54): take the top-k probabilities, keep the
    cumulative mass within the searchsorted(top_p) cutoff, renormalize,
    scatter back to a full-vocab distribution. Returns probabilities [B, V].
    """
    B, V = logits.shape
    # Same prefilter rationale as top_k_top_p_filter: without an explicit
    # top_k the reference takes top-V (a full sort); capping at
    # _TOPP_PREFILTER keeps results identical whenever the top_p cutoff
    # lands inside the window and turns the per-step full-vocab sort into a
    # top-k custom call.
    k = min(int(top_k) if top_k else _TOPP_PREFILTER, V)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p, idx = jax.lax.top_k(probs, k)  # descending
    cum = jnp.cumsum(p, axis=-1)
    # Cutoff = the smallest cumulative mass >= top_p (the searchsorted
    # position's value), else the total mass.  Computed with reductions —
    # slicing/gathering top_k-derived tensors triggers XLA's slow sort-based
    # top_k lowering (measured 36 vs 4.8 ms per step on [512, 50k] v5e).
    total = jnp.max(cum, axis=-1, keepdims=True)
    over = jnp.where(cum >= top_p, cum, jnp.inf)
    cutoffs = jnp.minimum(jnp.min(over, axis=-1, keepdims=True), total)
    censored = jnp.where(cum <= cutoffs, p, 0.0)
    renorm = censored / jnp.maximum(jnp.sum(censored, axis=-1, keepdims=True), 1e-20)
    full = jnp.zeros((B, V), dtype=jnp.float32)
    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (B, k), 0)
    return full.at[batch_idx, idx].set(renorm)


def sample_categorical(rng: Array, probs: Array) -> Array:
    """Multinomial sample from a probability batch [B, V] → [B]."""
    logp = jnp.log(jnp.maximum(probs, 1e-20))
    return jax.random.categorical(rng, logp, axis=-1)


def nucleus_sample(rng: Array, logits: Array, top_k: int, top_p: float) -> Array:
    """Nucleus-renormalize then sample — in the compact top-k domain.

    Equivalent to ``sample_categorical(rng, nucleus_renormalize(...))`` but
    the categorical draws over the ≤k surviving candidates instead of the
    full vocab: ``jax.random.categorical`` generates one Gumbel per class,
    and 26M threefry samples per decode step (batch 512 × 50k vocab) was the
    single largest cost of sampling decode.
    """
    B, V = logits.shape
    k = min(int(top_k) if top_k else _TOPP_PREFILTER, V)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p, idx = jax.lax.top_k(probs, k)  # descending
    cum = jnp.cumsum(p, axis=-1)
    # Reduction-based cutoff — see nucleus_renormalize for why no slicing.
    total = jnp.max(cum, axis=-1, keepdims=True)
    over = jnp.where(cum >= top_p, cum, jnp.inf)
    cutoffs = jnp.minimum(jnp.min(over, axis=-1, keepdims=True), total)
    censored = jnp.where(cum <= cutoffs, p, 0.0)
    logp = jnp.log(jnp.maximum(censored, 1e-20))
    j = jax.random.categorical(rng, logp, axis=-1)          # [B] over k classes
    return jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0]


def filtered_sample(rng: Array, logits: Array, live_k: int = 0) -> Array:
    """Categorical sample from filtered logits, drawing in the compact
    top-k domain (exact when everything outside the window is already
    NEG_INF — i.e. after ``top_k_top_p_filter`` with top_k or top_p on).
    ``live_k``: when the filter had an explicit top_k, at most that many
    candidates survive — sample over exactly that window."""
    B, V = logits.shape
    k = min(live_k if live_k else _TOPP_PREFILTER, V)
    vals, idx = jax.lax.top_k(logits, k)
    j = jax.random.categorical(rng, vals.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0]
