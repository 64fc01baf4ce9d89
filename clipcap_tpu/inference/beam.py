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

TPU-native: the growing ``embeds`` tensor is replaced by a beam-batched KV
cache reordered with gathers inside a ``lax.while_loop``; every shape is
static.  The whole search jits to one XLA program; prefixes can be batched
by ``jax.vmap`` over the leading axis.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from clipcap_tpu.models.gpt2 import GPT2Config, gpt2_apply, gpt2_embed_tokens, init_kv_cache

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BeamParams:
    beam_size: int = 5
    max_new_tokens: int = 67      # reference entry_length
    temperature: float = 1.0
    stop_token: int = 50256       # EOS (base.py:66)
    pad_token: int = 0


class BeamResult(NamedTuple):
    tokens: Array       # [beam, max_new_tokens] int32 (includes stop token)
    seq_lengths: Array  # [beam] float32 (reference counts the stop token)
    scores: Array       # [beam] float32, length-normalized final scores


@partial(jax.jit, static_argnames=("cfg", "bp", "dtype", "precision"))
def beam_search(
    params,
    cfg: GPT2Config,
    prefix_embeds: Array,  # [1, P, D] — reference asserts batch 1 (generate.py:19)
    bp: BeamParams,
    dtype=jnp.bfloat16,
    precision=None,
) -> BeamResult:
    P = prefix_embeds.shape[1]
    K = bp.beam_size
    N = bp.max_new_tokens
    total = P + N
    t = bp.temperature if bp.temperature > 0 else 1.0

    # Prefill once with batch 1, then tile the cache across beams — cheaper
    # than the reference's expand-and-reforward (base.py:87).
    cache1 = init_kv_cache(cfg, 1, total, dtype=dtype)
    logits1, cache1 = gpt2_apply(
        params, cfg, inputs_embeds=prefix_embeds.astype(dtype), kv_cache=cache1,
        cache_index=jnp.int32(0), dtype=dtype, precision=precision,
    )
    cache = {k: jnp.broadcast_to(v, (v.shape[0], K) + v.shape[2:]).copy()
             for k, v in cache1.items()}

    logp0 = jax.nn.log_softmax(logits1[:, -1].astype(jnp.float32) / t, axis=-1)  # [1, V]
    scores0, first_tokens = jax.lax.top_k(logp0[0], K)  # [K]

    tokens = jnp.full((K, N), bp.pad_token, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(first_tokens.astype(jnp.int32))
    seq_lengths = jnp.ones((K,), dtype=jnp.float32)
    has_stopped = first_tokens == bp.stop_token

    def cond(state):
        step, _, _, _, _, stopped = state
        return jnp.logical_and(step < N, ~jnp.all(stopped))

    def body(state):
        step, tokens, scores, seq_lengths, cache, stopped = state

        # Forward the tokens chosen at step-1 (cache position P + step - 1).
        last_tok = jax.lax.dynamic_index_in_dim(tokens, step - 1, axis=1)  # [K,1]
        emb = gpt2_embed_tokens(params, last_tok, dtype)
        step_logits, new_cache = gpt2_apply(
            params, cfg, inputs_embeds=emb, kv_cache=cache,
            cache_index=P + step - 1, dtype=dtype, precision=precision,
        )
        logp = jax.nn.log_softmax(step_logits[:, 0].astype(jnp.float32) / t, axis=-1)  # [K,V]

        # Stopped beams: only token 0 with additive score 0 (base.py:96-98).
        V = logp.shape[-1]
        frozen = jnp.full((V,), -jnp.inf).at[0].set(0.0)
        logp = jnp.where(stopped[:, None], frozen[None, :], logp)

        seq_lengths = seq_lengths + (~stopped).astype(jnp.float32)  # base.py:100
        scores_sum = scores[:, None] + logp                          # [K, V]
        avg = scores_sum / seq_lengths[:, None]
        avg_flat = avg.reshape(-1)
        top_avg, flat_idx = jax.lax.top_k(avg_flat, K)
        src = flat_idx // V                                          # source beam
        next_tok = (flat_idx % V).astype(jnp.int32)

        tokens = tokens[src]
        tokens = tokens.at[:, step].set(next_tok)
        seq_lengths = seq_lengths[src]
        stopped = stopped[src]
        scores = top_avg * seq_lengths                               # base.py:113
        cache = {k: v[:, src] for k, v in new_cache.items()}

        stopped = jnp.logical_or(stopped, next_tok == bp.stop_token)
        return (step + 1, tokens, scores, seq_lengths, cache, stopped)

    state = (jnp.int32(1), tokens, scores0, seq_lengths, cache, has_stopped)
    state = jax.lax.while_loop(cond, body, state)
    _, tokens, scores, seq_lengths, _, _ = state

    final_scores = scores / seq_lengths  # base.py:121
    return BeamResult(tokens=tokens, seq_lengths=seq_lengths, scores=final_scores)


@partial(jax.jit, static_argnames=("cfg", "bp", "dtype", "precision"))
def beam_search_batched(
    params,
    cfg: GPT2Config,
    prefix_embeds: Array,  # [N, P, D] — one beam search per row
    bp: BeamParams,
    dtype=jnp.bfloat16,
    precision=None,
) -> BeamResult:
    """Throughput path: N independent beam searches in ONE XLA program.

    Decode on TPU is HBM-bandwidth-bound — every step re-reads the LM
    weights — so batching searches amortizes the weight traffic across
    samples (the single-sample path pays the full weight read per caption).
    This is the serving-side replacement for looping ``beam_search``;
    results are identical per row.  Implemented with ``jax.vmap`` so the
    semantics stay defined by the single-sample function above.
    """
    fn = partial(beam_search.__wrapped__, params, cfg, bp=bp, dtype=dtype,
                 precision=precision)
    return jax.vmap(lambda pe: fn(pe[None]))(prefix_embeds)
