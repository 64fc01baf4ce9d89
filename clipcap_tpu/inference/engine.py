"""KV-cached decode engine: the TPU-native replacement for the reference's
grow-the-embeddings re-forward loops.

The reference re-runs the full language model on an ever-growing
``inputs_embeds`` every step (no KV cache — e.g.
/root/reference/clipcap/inference/no_beam.py:38, nucleus_sampling.py:35,
base.py:84).  That is O(T²·L) recompute with a dynamic shape per step —
hostile to XLA.  Here:

* the KV cache is preallocated at ``prefix_len + max_new_tokens``;
* the token loop is a single ``lax.while_loop`` with early exit when every
  sequence has emitted its stop token;
* each step is one fused XLA program: embed → one-token forward → logit
  processing → sample → cache write.

Everything is batch-first and fixed-shape so the same compiled program
serves greedy, temperature, top-k/top-p and nucleus sampling (samplers are
passed in as step functions).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from clipcap_tpu.models.gpt2 import GPT2Config, gpt2_apply, gpt2_embed_tokens, init_kv_cache
from clipcap_tpu.ops import sampling

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Static decode configuration (hashable → part of the jit key)."""

    max_new_tokens: int = 67          # reference entry_length (no_beam.py:18)
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.0
    repetition_penalty: float = 1.0   # reference default 1.2 (args.py)
    desired_sentence_length: int = 50
    sentence_length_factor: float = 0.0  # 1.0 enables the stop-logit scaling
    stop_token: int = 50256           # '.'=13 in no_beam/nucleus, eos in beam
    include_stop_token: bool = False  # nucleus appends the stop token; no_beam doesn't
    mode: str = "sample"              # "greedy" | "sample" | "nucleus"
    pad_token: int = 0
    # int8 KV cache serving (see BeamParams.int8_kv): halves the decode-
    # attention cache stream; off by default for parity.
    int8_kv: bool = False
    # Tile-major cache layout A/B (init_kv_cache ``tile_major``): one
    # contiguous HBM chunk per (row, u-tile) read.  None → env
    # CLIPCAP_CACHE_TILE_MAJOR.  Exact either way.
    tile_major: "bool | None" = None


class DecodeResult(NamedTuple):
    tokens: Array   # [B, max_new_tokens] int32, pad-filled after stop
    lengths: Array  # [B] int32, number of real tokens (excl. pads)


def _process_logits(
    logits: Array,
    tokens: Array,
    valid: Array,
    step: Array,
    sp: SamplingParams,
) -> Array:
    """Reference no_beam.py:44-60 logit pipeline, batched + fixed-shape."""
    logits = logits.astype(jnp.float32)
    if sp.repetition_penalty != 1.0:
        logits = sampling.repetition_penalty_apply(
            logits, tokens, sp.repetition_penalty, valid
        )
    t = sp.temperature if sp.temperature > 0 else 1.0
    logits = logits / t
    if sp.mode != "nucleus":
        logits = sampling.top_k_top_p_filter(logits, sp.top_k, sp.top_p)
    if sp.sentence_length_factor > 0.0:
        logits = sampling.sentence_length_penalty_apply(
            logits, sp.stop_token, step, sp.desired_sentence_length,
            sp.sentence_length_factor,
        )
    return logits


def _select_token(logits: Array, rng: Array, sp: SamplingParams) -> Array:
    if sp.mode == "greedy":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if sp.mode == "nucleus":
        if sp.top_p >= 1.0 and not sp.top_k:
            # No truncation requested: the candidate window would clip the
            # distribution; sample the full vocab directly.
            return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
        return sampling.nucleus_sample(rng, logits, sp.top_k, sp.top_p).astype(jnp.int32)
    if sp.top_k or (0.0 < sp.top_p < 1.0):
        # Tail already filtered to -inf: draw in the compact top-k domain
        # (full-vocab categorical generates 26M Gumbels/step at batch 512).
        return sampling.filtered_sample(rng, logits, live_k=int(sp.top_k)).astype(jnp.int32)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "sp", "dtype", "precision", "flash"))
def decode(
    params,
    cfg: GPT2Config,
    prefix_embeds: Array,
    rng: Array,
    sp: SamplingParams,
    prefix_tokens: Optional[Array] = None,
    dtype=jnp.bfloat16,
    precision=None,
    flash: "bool | None" = None,
) -> DecodeResult:
    """Generate up to ``sp.max_new_tokens`` per batch row.

    ``prefix_embeds``: [B, P, D] — mapper prefix (+ optional text-prefix
    embeddings already concatenated, as the reference does in
    generate.py:29-33).  ``prefix_tokens``: optional [B, Tp] token ids that
    produced the trailing part of the prefix; they seed the repetition-
    penalty buffer exactly like the reference's ``tokens`` variable.
    """
    B, P, D = prefix_embeds.shape
    N = sp.max_new_tokens
    total = P + N

    cache = init_kv_cache(cfg, B, total, dtype=dtype, int8=sp.int8_kv,
                          tile_major=sp.tile_major)

    # Prefill the whole prefix in one pass; only the LAST position's logits
    # feed the first sampling step, so project one row instead of the full
    # [B, P, vocab] table (at batch 512 that table alone is ~0.5 GB).
    hidden, cache = gpt2_apply(
        params, cfg, inputs_embeds=prefix_embeds.astype(dtype), kv_cache=cache,
        cache_index=jnp.int32(0), dtype=dtype, precision=precision,
        return_logits=False,
    )
    first_logits = jnp.dot(hidden[:, -1], params["wte"].T.astype(hidden.dtype),
                           precision=precision)  # [B, V]

    # Fixed-size repetition/token buffer: text-prefix tokens then generated.
    Tp = 0 if prefix_tokens is None else prefix_tokens.shape[1]
    buf = jnp.zeros((B, Tp + N), dtype=jnp.int32)
    valid = jnp.zeros((B, Tp + N), dtype=bool)
    if prefix_tokens is not None:
        buf = buf.at[:, :Tp].set(prefix_tokens.astype(jnp.int32))
        valid = valid.at[:, :Tp].set(True)

    out_tokens = jnp.full((B, N), sp.pad_token, dtype=jnp.int32)
    stopped = jnp.zeros((B,), dtype=bool)
    lengths = jnp.zeros((B,), dtype=jnp.int32)

    def cond(state):
        step, _, _, _, _, _, _, stopped, _ = state
        return jnp.logical_and(step < N, ~jnp.all(stopped))

    def body(state):
        step, rng, cur_logits, cache, buf, valid, out_tokens, stopped, lengths = state
        rng, sub = jax.random.split(rng)

        # current_length for the sentence-length penalty = tokens so far
        # (reference passes tokens.shape[1], which includes the text prefix).
        cur_len = Tp + step
        proc = _process_logits(cur_logits, buf, valid, cur_len, sp)
        next_tok = _select_token(proc, sub, sp)

        is_stop = next_tok == sp.stop_token
        newly_stopped = jnp.logical_and(is_stop, ~stopped)

        # Record the token unless the row already stopped (and optionally
        # skip recording the stop token itself, like no_beam.py:67-75).
        record = ~stopped if sp.include_stop_token else jnp.logical_and(~stopped, ~is_stop)
        write_tok = jnp.where(record, next_tok, sp.pad_token)
        out_tokens = out_tokens.at[:, step].set(
            jnp.where(record, write_tok, out_tokens[:, step])
        )
        lengths = lengths + record.astype(jnp.int32)

        buf = buf.at[:, Tp + step].set(jnp.where(record, next_tok, buf[:, Tp + step]))
        valid = valid.at[:, Tp + step].set(jnp.logical_or(valid[:, Tp + step], record))

        stopped = jnp.logical_or(stopped, is_stop)

        # Forward the chosen token (stopped rows feed pad; masked out anyway).
        feed = jnp.where(stopped, sp.pad_token, next_tok)
        emb = gpt2_embed_tokens(params, feed[:, None], dtype)
        step_logits, cache = gpt2_apply(
            params, cfg, inputs_embeds=emb, kv_cache=cache,
            cache_index=P + step, dtype=dtype, precision=precision,
            flash=flash,
        )
        return (step + 1, rng, step_logits[:, 0], cache, buf, valid,
                out_tokens, stopped, lengths)

    state = (jnp.int32(0), rng, first_logits, cache, buf, valid,
             out_tokens, stopped, lengths)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, _, _, out_tokens, _, lengths = state
    return DecodeResult(tokens=out_tokens, lengths=lengths)
