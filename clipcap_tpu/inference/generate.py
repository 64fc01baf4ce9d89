"""Public generation API — name/signature parity with the reference's
inference functions, backed by the KV-cached engine.

Reference surfaces re-implemented:
* ``generate_no_beam``        (/root/reference/clipcap/inference/no_beam.py:10-82)
* ``generate_nucleus_sampling`` (nucleus_sampling.py:9-75)
* ``generate_beam``           (base.py:55-132)
* ``generate``                (generate.py:8-44)

TPU-native deviations (documented):
* ``number_to_generate`` candidates are generated as ONE batched decode
  (the prefix is tiled and each row gets its own RNG stream) instead of a
  python loop of full re-forwards.
* ``generate_beam`` returns the top ``number_to_generate`` distinct beams;
  the reference's outer loop re-enters the beam with mutated state and
  returns duplicates (a shipped bug — SURVEY.md §"bugs").
* Stop-token conventions preserved exactly: '.' for no_beam/nucleus
  (no_beam.py:24, nucleus_sampling.py:21), EOS for beam (base.py:66);
  nucleus includes the stop token in its output, no_beam does not.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clipcap_tpu.inference.beam import BeamParams, BeamResult, beam_search
from clipcap_tpu.inference.engine import DecodeResult, SamplingParams, decode
from clipcap_tpu.models.clipcap import ClipCapModel
from clipcap_tpu.models.gpt2 import gpt2_embed_tokens

Array = jax.Array


def _prep_embeds(model: ClipCapModel, embeds: Array,
                 text_prefix_tokens: Optional[Array], dtype) -> Array:
    """Concat text-prefix token embeddings after the mapper prefix
    (reference no_beam.py:30-33)."""
    embeds = jnp.asarray(embeds, dtype=dtype)
    if text_prefix_tokens is not None:
        tp = gpt2_embed_tokens(model.params["lm"], jnp.asarray(text_prefix_tokens), dtype)
        embeds = jnp.concatenate([embeds, tp], axis=1)
    return embeds


def _decode_texts(tokenizer, prefix_ids: List[int], result: DecodeResult) -> List[str]:
    toks = np.asarray(result.tokens)
    lens = np.asarray(result.lengths)
    out = []
    for row, n in zip(toks, lens):
        out.append(tokenizer.decode(prefix_ids + [int(t) for t in row[: int(n)]]))
    return out


def generate_no_beam(
    model: ClipCapModel,
    tokenizer,
    embeds: Array,
    number_to_generate: int = 5,
    text_prefix_tokens: Optional[Array] = None,
    top_p: float = 0.9,
    top_k: int = 0,
    entry_length: int = 67,
    temperature: float = 1.0,
    repetition_penalty: float = 1.2,
    desired_sentence_length: int = 50,
    sentence_length_factor: float = 1.0,
    seed: int = 0,
    int8_kv: bool = False,
    dtype=jnp.float32,
    precision=None,
) -> List[str]:
    stop_token = tokenizer.encode(".")[0]
    embeds = _prep_embeds(model, embeds, text_prefix_tokens, dtype)
    assert embeds.shape[0] == 1, "pass a single sample; candidates are batched internally"

    tiled = jnp.broadcast_to(embeds, (number_to_generate,) + embeds.shape[1:])
    ptoks = None
    prefix_ids: List[int] = []
    if text_prefix_tokens is not None:
        prefix_ids = [int(t) for t in np.asarray(text_prefix_tokens).reshape(-1)]
        ptoks = jnp.broadcast_to(jnp.asarray(text_prefix_tokens).reshape(1, -1),
                                 (number_to_generate, len(prefix_ids)))

    sp = SamplingParams(
        max_new_tokens=entry_length, temperature=temperature,
        top_k=int(top_k), top_p=float(top_p),
        repetition_penalty=repetition_penalty,
        desired_sentence_length=desired_sentence_length,
        sentence_length_factor=sentence_length_factor,
        stop_token=stop_token, include_stop_token=False, mode="sample",
        int8_kv=int8_kv,
    )
    result = decode(model.params["lm"], model.lm_config, tiled,
                    jax.random.PRNGKey(seed), sp, prefix_tokens=ptoks,
                    dtype=dtype, precision=precision)
    return _decode_texts(tokenizer, prefix_ids, result)


def generate_nucleus_sampling(
    model: ClipCapModel,
    tokenizer,
    embeds: Array,
    number_to_generate: int = 1,
    text_prefix_tokens: Optional[Array] = None,
    entry_length: int = 67,
    top_p: float = 0.8,
    top_k: int = 0,
    temperature: float = 1.0,
    seed: int = 0,
    int8_kv: bool = False,
    dtype=jnp.float32,
    precision=None,
    mesh=None,
) -> List[str]:
    stop_token = tokenizer.encode(".")[0]
    embeds = _prep_embeds(model, embeds, text_prefix_tokens, dtype)
    assert embeds.shape[0] == 1

    tiled = jnp.broadcast_to(embeds, (number_to_generate,) + embeds.shape[1:])
    prefix_ids: List[int] = []
    if text_prefix_tokens is not None:
        prefix_ids = [int(t) for t in np.asarray(text_prefix_tokens).reshape(-1)]

    sp = SamplingParams(
        max_new_tokens=entry_length, temperature=temperature,
        top_k=int(top_k) if top_k else 0, top_p=float(top_p) if top_p else 1.0,
        repetition_penalty=1.0, sentence_length_factor=0.0,
        stop_token=stop_token, include_stop_token=True, mode="nucleus",
        int8_kv=int8_kv,
    )
    if mesh is not None:
        from clipcap_tpu.inference.serving import decode_sharded

        result = decode_sharded(model.params["lm"], model.lm_config, tiled,
                                jax.random.PRNGKey(seed), sp, mesh, dtype,
                                precision=precision)
    else:
        result = decode(model.params["lm"], model.lm_config, tiled,
                        jax.random.PRNGKey(seed), sp, dtype=dtype,
                        precision=precision)
    return _decode_texts(tokenizer, prefix_ids, result)


def generate_beam(
    model: ClipCapModel,
    tokenizer,
    embeds: Array,
    number_to_generate: int = 1,
    text_prefix_tokens: Optional[Array] = None,
    beam_size: int = 5,
    entry_length: int = 67,
    temperature: float = 1.0,
    int8_kv: bool = False,
    dtype=jnp.float32,
    precision=None,
) -> List[str]:
    stop_token = tokenizer.eos_token_id
    embeds = _prep_embeds(model, embeds, text_prefix_tokens, dtype)
    assert embeds.shape[0] == 1

    bp = BeamParams(beam_size=beam_size, max_new_tokens=entry_length,
                    temperature=temperature, stop_token=stop_token,
                    int8_kv=int8_kv)
    result: BeamResult = beam_search(model.params["lm"], model.lm_config,
                                     embeds, bp, dtype=dtype, precision=precision)
    toks = np.asarray(result.tokens)
    lens = np.asarray(result.seq_lengths)
    order = np.argsort(-np.asarray(result.scores))
    texts = [tokenizer.decode([int(t) for t in toks[i][: int(lens[i])]]) for i in order]
    n = max(1, number_to_generate)
    if n > len(texts):
        # The reference returns exactly number_to_generate strings even
        # past beam_size (its deterministic re-runs yield duplicates,
        # /root/reference/clipcap/inference/base.py:79): cycle the ranked
        # beams so callers sized to number_to_generate never see a short
        # list.
        texts = [texts[i % len(texts)] for i in range(n)]
    return texts[:n]


def generate(
    model: ClipCapModel,
    tokenizer,
    embeddings: Array,
    top_p: float = 0.95,
    top_k: int = 0,
    temperature: float = 1.0,
    number_to_generate: int = 5,
    text_prefix: Optional[str] = None,
    stop_token: Optional[str] = None,
    seed: int = 0,
    int8_kv: bool = False,
    dtype=jnp.float32,
    precision=None,
) -> List[str]:
    """Convenience wrapper (reference generate.py:8-44): bos (+ optional
    text prefix) tokens → mapper prefix → sampling decode."""
    batch_size = embeddings.shape[0]
    assert batch_size == 1, "single-sample API (reference parity)"

    if text_prefix is not None:
        text_prefix = tokenizer.bos_token + text_prefix
    else:
        text_prefix = tokenizer.bos_token
    text_prefix_tokens = jnp.asarray(tokenizer.encode(text_prefix), jnp.int32)[None, :]

    prefix_projections = model.transformer_mapper(
        jnp.asarray(embeddings), dtype=dtype, precision=precision
    )

    return generate_no_beam(
        model, tokenizer, prefix_projections,
        number_to_generate=number_to_generate,
        text_prefix_tokens=text_prefix_tokens,
        top_p=top_p, top_k=top_k, temperature=temperature,
        seed=seed, int8_kv=int8_kv, dtype=dtype, precision=precision,
    )
