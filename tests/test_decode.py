"""Decode engine: temp-0 token parity vs HF generate, logit-processor parity
vs the reference algorithms, beam-search parity vs a literal numpy port of
the reference control flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipcap_tpu.inference.beam import BeamParams, beam_search
from clipcap_tpu.inference.engine import SamplingParams, decode
from clipcap_tpu.models.gpt2 import gpt2_apply, gpt2_embed_tokens
from clipcap_tpu.models.hf_import import gpt2_config_from_hf, gpt2_params_from_hf
from clipcap_tpu.ops import sampling

torch = pytest.importorskip("torch")

TINY = dict(vocab_size=211, n_positions=128, n_embd=32, n_layer=2, n_head=4)


@pytest.fixture(scope="module")
def tiny():
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    torch.manual_seed(7)
    hf_cfg = HFConfig(
        vocab_size=TINY["vocab_size"], n_positions=TINY["n_positions"],
        n_embd=TINY["n_embd"], n_layer=TINY["n_layer"], n_head=TINY["n_head"],
    )
    model = GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2_config_from_hf(hf_cfg)
    params = gpt2_params_from_hf(model.state_dict(), cfg)
    return model, params, cfg


def test_greedy_token_parity_vs_hf(tiny):
    """North-star: temperature-0 captions must match the reference
    token-for-token (BASELINE.md). HF generate(do_sample=False) from
    inputs_embeds is the oracle."""
    hf, params, cfg = tiny
    rng = np.random.default_rng(11)
    prefix = rng.normal(size=(1, 7, cfg.n_embd)).astype(np.float32) * 0.02
    N = 12

    with torch.no_grad():
        hf_out = hf.generate(
            inputs_embeds=torch.tensor(prefix), max_new_tokens=N,
            do_sample=False, eos_token_id=None, pad_token_id=0,
        ).numpy()[0]

    sp = SamplingParams(max_new_tokens=N, mode="greedy", stop_token=-1,
                        repetition_penalty=1.0)
    res = decode(params, cfg, jnp.asarray(prefix), jax.random.PRNGKey(0), sp,
                 dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    ours = np.asarray(res.tokens)[0][: int(res.lengths[0])]
    np.testing.assert_array_equal(ours, hf_out[:N])


@pytest.mark.slow
def test_engine_stops_and_excludes_stop_token(tiny):
    _, params, cfg = tiny
    prefix = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, cfg.n_embd)).astype(np.float32))
    # Find each row's greedy path, then set stop_token to the 3rd greedy token
    sp0 = SamplingParams(max_new_tokens=8, mode="greedy", stop_token=-1, repetition_penalty=1.0)
    base = decode(params, cfg, prefix, jax.random.PRNGKey(0), sp0, dtype=jnp.float32)
    stop = int(np.asarray(base.tokens)[0, 2])

    sp = SamplingParams(max_new_tokens=8, mode="greedy", stop_token=stop,
                        include_stop_token=False, repetition_penalty=1.0)
    res = decode(params, cfg, prefix, jax.random.PRNGKey(0), sp, dtype=jnp.float32)
    toks0 = np.asarray(res.tokens)[0]
    assert int(res.lengths[0]) <= 2 or stop not in toks0[: int(res.lengths[0])]

    sp_inc = SamplingParams(max_new_tokens=8, mode="greedy", stop_token=stop,
                            include_stop_token=True, repetition_penalty=1.0)
    res_inc = decode(params, cfg, prefix, jax.random.PRNGKey(0), sp_inc, dtype=jnp.float32)
    row = np.asarray(res_inc.tokens)[0][: int(res_inc.lengths[0])]
    if stop in row:
        assert row[-1] == stop  # stop token recorded last, nothing after


def test_top_k_top_p_filter_parity():
    """Against the reference's torch gist (utils.py:5-32), per-row."""
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(4, 50)).astype(np.float32) * 3

    def ref_filter(row, top_k, top_p):
        row = torch.tensor(row.copy())
        if top_k > 0:
            kth = torch.topk(row, top_k)[0][-1]
            row[row < kth] = -float("inf")
        if top_p > 0:
            sl, si = torch.sort(row, descending=True)
            cp = torch.cumsum(F.softmax(sl, dim=-1), dim=-1)
            rm = cp > top_p
            rm[1:] = rm[:-1].clone()
            rm[0] = False
            row[si[rm]] = -float("inf")
        return row.numpy()

    for top_k, top_p in [(0, 0.9), (10, 0.0), (7, 0.6), (0, 0.0)]:
        ours = np.asarray(sampling.top_k_top_p_filter(jnp.asarray(logits), top_k, top_p))
        for b in range(4):
            ref = ref_filter(logits[b], top_k, top_p)
            finite = np.isfinite(ref)
            ours_keep = ours[b] > -1e8
            np.testing.assert_array_equal(ours_keep, finite)
            np.testing.assert_allclose(ours[b][finite], ref[finite], atol=1e-6)


def test_repetition_penalty_parity():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 30)).astype(np.float32)
    tokens = np.array([[1, 5, 5, 2], [0, 3, 7, 9]], dtype=np.int32)

    def ref(row, toks, p):
        row = torch.tensor(row.copy())
        t = torch.tensor(toks.astype(np.int64))
        tl = torch.gather(row, -1, t)
        tl = torch.where(tl < 0, tl * p, tl / p)
        row.scatter_(-1, t, tl)
        return row.numpy()

    ours = np.asarray(sampling.repetition_penalty_apply(
        jnp.asarray(logits), jnp.asarray(tokens), 1.2,
        valid=jnp.ones_like(jnp.asarray(tokens), dtype=bool)))
    for b in range(2):
        np.testing.assert_allclose(ours[b], ref(logits[b], tokens[b], 1.2), atol=1e-6)


def test_nucleus_renormalize_parity():
    """Against the reference's batched searchsorted construction
    (nucleus_sampling.py:44-54)."""
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(3, 40)).astype(np.float32) * 2
    top_p, top_k = 0.8, 40

    lt = torch.tensor(logits)
    p, idx = F.softmax(lt, dim=-1).topk(top_k, dim=-1)
    cp = p.cumsum(dim=-1)
    thr = top_p + torch.zeros((3, 1))
    cut = torch.searchsorted(cp, thr).clip(max=top_k - 1).squeeze()
    cutoffs = cp[torch.arange(3), cut]
    cens = (cp <= cutoffs[:, None]) * p
    renorm = cens / cens.sum(dim=-1, keepdims=True)
    ref = torch.zeros_like(lt)
    rowi = torch.arange(3).unsqueeze(1).repeat(1, top_k)
    ref[rowi, idx] = renorm
    ref = ref.numpy()

    ours = np.asarray(sampling.nucleus_renormalize(jnp.asarray(logits), top_k, top_p))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _numpy_reference_beam(params, cfg, prefix, beam_size, N, stop_token):
    """Literal numpy port of the reference's beam control flow
    (base.py:55-132), using full re-forwards (no cache) as the oracle."""
    def forward_last_logits(embeds):
        logits, _ = gpt2_apply(params, cfg, inputs_embeds=jnp.asarray(embeds),
                               dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        return np.asarray(logits[:, -1, :])

    def embed(tok_ids):
        return np.asarray(gpt2_embed_tokens(params, jnp.asarray(tok_ids), jnp.float32))

    embeds = prefix.copy()  # [1, P, D]
    tokens = None
    scores = None
    seq_lengths = np.ones(beam_size)
    has_stopped = np.zeros(beam_size, dtype=bool)

    for _ in range(N):
        logits = forward_last_logits(embeds)
        logp = np.log(_softmax(logits))
        if scores is None:
            order = np.argsort(-logp[0], kind="stable")[:beam_size]
            scores = logp[0][order]
            tokens = order[:, None].astype(np.int64)
            embeds = np.repeat(embeds, beam_size, axis=0)
        else:
            logp[has_stopped] = -np.inf
            logp[has_stopped, 0] = 0
            scores_sum = scores[:, None] + logp
            seq_lengths[~has_stopped] += 1
            avg = scores_sum / seq_lengths[:, None]
            flat = avg.reshape(-1)
            idx = np.argsort(-flat, kind="stable")[:beam_size]
            src = idx // logp.shape[1]
            nxt = idx % logp.shape[1]
            seq_lengths = seq_lengths[src]
            tokens = np.concatenate([tokens[src], nxt[:, None]], axis=1)
            embeds = embeds[src]
            scores = flat[idx] * seq_lengths
            has_stopped = has_stopped[src]
        next_tokens = tokens[:, -1]
        emb = embed(next_tokens[:, None])
        embeds = np.concatenate([embeds, emb], axis=1)
        has_stopped = has_stopped | (next_tokens == stop_token)
        if has_stopped.all():
            break
    return tokens, scores / seq_lengths, seq_lengths


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


@pytest.mark.slow
def test_beam_parity_vs_reference_semantics(tiny):
    _, params, cfg = tiny
    rng = np.random.default_rng(6)
    prefix = rng.normal(size=(1, 5, cfg.n_embd)).astype(np.float32) * 0.02
    K, N = 4, 10
    stop = 3  # arbitrary token id as "eos" for the tiny vocab

    ref_tokens, ref_scores, ref_lens = _numpy_reference_beam(
        params, cfg, prefix, K, N, stop
    )

    bp = BeamParams(beam_size=K, max_new_tokens=N, stop_token=stop)
    res = beam_search(params, cfg, jnp.asarray(prefix), bp,
                      dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    got_tokens = np.asarray(res.tokens)
    T = ref_tokens.shape[1]
    np.testing.assert_array_equal(got_tokens[:, :T], ref_tokens)
    np.testing.assert_allclose(np.asarray(res.scores), ref_scores, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.seq_lengths), ref_lens, atol=1e-6)


@pytest.mark.slow
def test_beam_search_batched_matches_single():
    """Throughput path (one XLA program for N searches) must be result-
    identical to the single-sample beam."""
    import jax.numpy as jnp

    from clipcap_tpu.inference.beam import BeamParams, beam_search, beam_search_batched
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2

    cfg = GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    bp = BeamParams(beam_size=3, max_new_tokens=10, stop_token=5)
    rng = np.random.default_rng(0)
    pre = jnp.asarray(rng.normal(size=(4, 6, 32)), jnp.float32)

    batched = beam_search_batched(params, cfg, pre, bp, dtype=jnp.float32)
    for i in range(4):
        single = beam_search(params, cfg, pre[i : i + 1], bp, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(batched.tokens[i]),
                                      np.asarray(single.tokens))
        np.testing.assert_allclose(np.asarray(batched.scores[i]),
                                   np.asarray(single.scores), rtol=1e-5)


@pytest.mark.slow
def test_top_p_prefilter_window_semantics(monkeypatch):
    """The top-p window (ops/sampling._TOPP_PREFILTER) is exact whenever the
    nucleus cutoff lands inside it; on pathologically flat rows the nucleus
    truncates gracefully to the window (never keeps garbage, never crashes)."""
    monkeypatch.setattr(sampling, "_TOPP_PREFILTER", 8)

    # Peaked: nucleus fits the window -> exact vs the sort-based construction.
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 40)).astype(np.float32)
    logits[:, :4] += 10.0  # 4 dominant tokens; cutoff well inside 8
    out = np.asarray(sampling.top_k_top_p_filter(jnp.asarray(logits), 0, 0.9))

    for b in range(3):
        row = logits[b]
        order = np.argsort(-row, kind="stable")
        probs = np.exp(row - row.max()); probs /= probs.sum()
        cp = np.cumsum(probs[order])
        rm = cp > 0.9
        rm[1:] = rm[:-1].copy(); rm[0] = False
        expected_keep = np.ones(40, bool)
        expected_keep[order[rm]] = False
        np.testing.assert_array_equal(out[b] > -1e8, expected_keep)

    # Flat: nucleus would need ~36 of 40 tokens; keeps exactly the window.
    flat = np.zeros((2, 40), np.float32)
    out = np.asarray(sampling.top_k_top_p_filter(jnp.asarray(flat), 0, 0.9))
    assert (out > -1e8).sum(axis=-1).tolist() == [8, 8]

    # nucleus_sample on flat rows: samples only within the window, no NaNs.
    toks = np.asarray(sampling.nucleus_sample(
        jax.random.PRNGKey(0), jnp.asarray(flat), 0, 0.9))
    assert toks.shape == (2,) and (toks >= 0).all() and (toks < 40).all()


def test_top_p_one_keeps_full_vocab():
    """top_p >= 1 must not truncate to the candidate window: the filter is a
    no-op and sampling can reach every vocab id."""
    V = 300  # > the (monkeypatch-free) window in spirit; logits flat
    logits = jnp.zeros((2, V), jnp.float32)
    out = np.asarray(sampling.top_k_top_p_filter(logits, 0, 1.0))
    assert (out > -1e8).all()

    from clipcap_tpu.inference.engine import SamplingParams, _select_token

    sp = SamplingParams(mode="nucleus", top_p=1.0, top_k=0)
    toks = set()
    for i in range(64):
        t = np.asarray(_select_token(logits, jax.random.PRNGKey(i), sp))
        toks.update(t.tolist())
    # Flat distribution over 300 ids: 128 draws collide with a tiny window;
    # spread beyond any window size demonstrates full-vocab reach.
    assert len(toks) > 90, len(toks)


@pytest.mark.slow
def test_beam_consolidation_parity():
    """Converged-prefix consolidation must not change beam results: every
    cadence (including every-step) reproduces the unconsolidated search
    token-for-token on a tiny model, fp32."""
    import dataclasses

    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2

    cfg = GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    rng = np.random.default_rng(3)
    pre = jnp.asarray(rng.normal(size=(3, 6, 32)), jnp.float32)

    base = BeamParams(beam_size=3, max_new_tokens=12, stop_token=5,
                      consolidate_every=0)
    ref = beam_search_batched(params, cfg, pre, base, dtype=jnp.float32)
    for C in (1, 2, 5, 16):
        bp = dataclasses.replace(base, consolidate_every=C)
        got = beam_search_batched(params, cfg, pre, bp, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens), err_msg=f"C={C}")
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(ref.scores), atol=1e-4,
                                   err_msg=f"C={C}")
        np.testing.assert_allclose(np.asarray(got.seq_lengths),
                                   np.asarray(ref.seq_lengths), atol=1e-6)


@pytest.mark.slow
def test_beam_folded_prefix_parity():
    """The folded-prefix cache layout (prefix stored once at the buffer
    head, default) must reproduce the replicated-prefix layout
    token-for-token — fp32, including the int8-KV cache variant."""
    import dataclasses

    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2

    cfg = GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    rng = np.random.default_rng(7)
    pre = jnp.asarray(rng.normal(size=(3, 6, 32)), jnp.float32)

    for int8 in (False, True):
        folded = BeamParams(beam_size=3, max_new_tokens=12, stop_token=5,
                            fold_prefix=True, int8_kv=int8)
        replicated = dataclasses.replace(folded, fold_prefix=False)
        got = beam_search_batched(params, cfg, pre, folded, dtype=jnp.float32)
        ref = beam_search_batched(params, cfg, pre, replicated,
                                  dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens),
                                      err_msg=f"int8={int8}")
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(ref.scores), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.seq_lengths),
                                   np.asarray(ref.seq_lengths), atol=1e-6)


@pytest.mark.slow
def test_tile_major_cache_parity():
    """The tile-major cache layout (``init_kv_cache(tile_major=True)``:
    ``[B, n_tiles, H, u_tile, 2*Dh]`` — one CONTIGUOUS HBM chunk per
    (row, u-tile) kernel read) must be token-identical to the default
    strided layout on every decode path: beam folded/replicated prefix and
    batched sampling, with the flash kernel (interpret mode here) and the
    XLA fallback.  Multi-tile buffers so decode-step writes straddle
    u-tile boundaries."""
    import dataclasses

    import jax

    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
    from clipcap_tpu.inference.engine import SamplingParams, decode
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2

    cfg = GPT2Config(vocab_size=211, n_positions=256, n_embd=64, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    rng = np.random.default_rng(5)
    pre = jnp.asarray(rng.normal(size=(4, 4, 64)) * 0.02, jnp.float32)

    # stop_token outside the vocab: all 40 steps run, spanning >1 u-tile
    # (beam cache: 4 + 5*40 slots).
    bp = BeamParams(beam_size=5, max_new_tokens=40, stop_token=2111,
                    tile_major=False)
    sp = SamplingParams(max_new_tokens=40, mode="greedy", stop_token=2111,
                        tile_major=False)
    for flash in (False, True):
        ref_b = beam_search_batched(params, cfg, pre, bp,
                                    dtype=jnp.float32, flash=flash)
        got_b = beam_search_batched(params, cfg, pre,
                                    dataclasses.replace(bp, tile_major=True),
                                    dtype=jnp.float32, flash=flash)
        np.testing.assert_array_equal(np.asarray(ref_b.tokens),
                                      np.asarray(got_b.tokens),
                                      err_msg=f"beam flash={flash}")
        np.testing.assert_allclose(np.asarray(ref_b.scores),
                                   np.asarray(got_b.scores), atol=1e-5)
        ref_d = decode(params, cfg, pre, jax.random.PRNGKey(0), sp,
                       dtype=jnp.float32, flash=flash)
        got_d = decode(params, cfg, pre, jax.random.PRNGKey(0),
                       dataclasses.replace(sp, tile_major=True),
                       dtype=jnp.float32, flash=flash)
        np.testing.assert_array_equal(np.asarray(ref_d.tokens),
                                      np.asarray(got_d.tokens),
                                      err_msg=f"decode flash={flash}")

    # Replicated-prefix beam layout under tile-major too.
    repl = dataclasses.replace(bp, fold_prefix=False)
    a = beam_search_batched(params, cfg, pre, repl, dtype=jnp.float32,
                            flash=True)
    b = beam_search_batched(params, cfg, pre,
                            dataclasses.replace(repl, tile_major=True),
                            dtype=jnp.float32, flash=True)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_generate_beam_exact_length_contract(tiny):
    """generate_beam returns EXACTLY number_to_generate captions — past
    beam_size it cycles the ranked beams (the reference's deterministic
    re-runs return duplicates, reference inference/base.py:79), so callers
    sized to number_to_generate never see a short list (review r5)."""
    import jax.numpy as jnp

    from clipcap_tpu.config import Config, EncoderConfig
    from clipcap_tpu.inference.generate import generate_beam
    from clipcap_tpu.models.clipcap import ClipCapModel
    from clipcap_tpu.models.mapper import MapperConfig, init_mapper
    from clipcap_tpu.utils.tokenizer import get_tokenizer

    _, params, cfg = tiny
    config = Config(language_model="tiny", prefix_length=4,
                    projection_length=4,
                    encoder_config=EncoderConfig(encoder_embedding_size=16))
    mcfg = MapperConfig(encoder_embedding_size=16,
                        lm_embedding_size=cfg.n_embd, prefix_length=4,
                        projection_length=4, num_layers=1, num_heads=2)
    model = ClipCapModel(config=config, lm_config=cfg, mapper_config=mcfg,
                         params={"mapper": init_mapper(mcfg, seed=0),
                                 "lm": params})
    tok = get_tokenizer("tiny")
    prefix = jnp.asarray(
        (np.random.default_rng(3).normal(size=(1, 4, cfg.n_embd)) * 0.02)
        .astype(np.float32))
    c5 = generate_beam(model, tok, prefix, beam_size=4, entry_length=6,
                       number_to_generate=4)
    c9 = generate_beam(model, tok, prefix, beam_size=4, entry_length=6,
                       number_to_generate=9)
    c1 = generate_beam(model, tok, prefix, beam_size=4, entry_length=6,
                       number_to_generate=1)
    assert len(c5) == 4 and len(c9) == 9 and len(c1) == 1
    assert c9[:4] == c5 and c9[4:8] == c5 and c9[8] == c5[0]


def test_pick_u_tile_explicit_cap_contract():
    """Explicit caps split the region even below the sublane quantum (the
    smallest aligned divisor above the cap), and the default path keeps
    its single-tile and near-cap behaviors (review r5)."""
    from clipcap_tpu.ops.flash_decode import _pick_u_tile

    assert _pick_u_tile(384) == 64          # default cap: aligned divisor
    assert _pick_u_tile(80) == 80           # <=128 slots: single tile
    assert _pick_u_tile(384, cap=96) == 96  # explicit aligned cap honored
    assert _pick_u_tile(384, cap=8) == 16   # sub-sublane cap: smallest
    assert _pick_u_tile(384, cap=17) == 16  # unaligned cap: best below
