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
        kth = jax.lax.top_k(out, k)[0][..., -1:]
        out = jnp.where(out < kth, NEG_INF, out)

    if top_p and top_p > 0.0:
        sorted_logits = jnp.sort(out, axis=-1)[..., ::-1]
        sorted_idx = jnp.argsort(out, axis=-1)[..., ::-1]
        cumprobs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # Shift right so the first token crossing the threshold survives
        # (reference utils.py:29-31).
        remove = cumprobs > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        filtered_sorted = jnp.where(remove, NEG_INF, sorted_logits)
        # Unsort back to vocab order.
        inv = jnp.argsort(sorted_idx, axis=-1)
        out = jnp.take_along_axis(filtered_sorted, inv, axis=-1)

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
    k = min(int(top_k) if top_k else V, V)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p, idx = jax.lax.top_k(probs, k)  # descending
    cum = jnp.cumsum(p, axis=-1)
    # searchsorted per row: first position where cum >= top_p, clipped.
    cut_pos = jnp.sum((cum < top_p).astype(jnp.int32), axis=-1)
    cut_pos = jnp.clip(cut_pos, 0, k - 1)
    cutoffs = jnp.take_along_axis(cum, cut_pos[:, None], axis=-1)
    censored = jnp.where(cum <= cutoffs, p, 0.0)
    renorm = censored / jnp.maximum(jnp.sum(censored, axis=-1, keepdims=True), 1e-20)
    full = jnp.zeros((B, V), dtype=jnp.float32)
    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (B, k), 0)
    return full.at[batch_idx, idx].set(renorm)


def sample_categorical(rng: Array, probs: Array) -> Array:
    """Multinomial sample from a probability batch [B, V] → [B]."""
    logp = jnp.log(jnp.maximum(probs, 1e-20))
    return jax.random.categorical(rng, logp, axis=-1)
