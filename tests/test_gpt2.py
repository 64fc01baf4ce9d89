"""GPT-2 core: parity vs HF PyTorch, KV-cache consistency, scan/masking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipcap_tpu.models.gpt2 import (
    GPT2Config,
    gpt2_apply,
    gpt2_embed_tokens,
    init_gpt2,
    init_kv_cache,
)
from clipcap_tpu.models.hf_import import gpt2_config_from_hf, gpt2_params_from_hf

TINY = dict(vocab_size=97, n_positions=64, n_embd=32, n_layer=3, n_head=4)


@pytest.fixture(scope="module")
def tiny_hf_model():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=TINY["vocab_size"],
        n_positions=TINY["n_positions"],
        n_embd=TINY["n_embd"],
        n_layer=TINY["n_layer"],
        n_head=TINY["n_head"],
    )
    model = GPT2LMHeadModel(hf_cfg).eval()
    return model, hf_cfg


@pytest.fixture(scope="module")
def tiny_jax(tiny_hf_model):
    model, hf_cfg = tiny_hf_model
    cfg = gpt2_config_from_hf(hf_cfg)
    params = gpt2_params_from_hf(model.state_dict(), cfg)
    return params, cfg


def test_logit_parity_full_sequence(tiny_hf_model, tiny_jax):
    import torch

    model, _ = tiny_hf_model
    params, cfg = tiny_jax
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12))

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()

    logits, _ = gpt2_apply(
        params, cfg, input_ids=jnp.asarray(ids), dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-4)


def test_logit_parity_inputs_embeds_and_mask(tiny_hf_model, tiny_jax):
    """The exact call pattern the reference uses: inputs_embeds + attention_mask
    with trailing padding (/root/reference/clipcap/model/model.py:43-58)."""
    import torch

    model, _ = tiny_hf_model
    params, cfg = tiny_jax
    rng = np.random.default_rng(2)
    B, T = 2, 10
    embeds = rng.normal(size=(B, T, cfg.n_embd)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.int64)
    mask[0, 7:] = 0  # trailing pads like the training batch layout

    with torch.no_grad():
        ref = model(
            inputs_embeds=torch.tensor(embeds), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    logits, _ = gpt2_apply(
        params, cfg, inputs_embeds=jnp.asarray(embeds),
        attention_mask=jnp.asarray(mask), dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Only compare non-pad query positions: HF leaves pad rows defined but
    # downstream never reads them.
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours[0, :7], ref[0, :7], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours[1], ref[1], atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_kv_cache_matches_full_forward(tiny_jax):
    """Prefill + single-token decode through the cache must equal the
    uncached full forward (the reference re-forwards everything each step;
    our cache is the TPU-native replacement and must be numerically equal)."""
    params, cfg = tiny_jax
    rng = np.random.default_rng(3)
    B, T = 2, 9
    embeds = jnp.asarray(rng.normal(size=(B, T, cfg.n_embd)).astype(np.float32))

    full_logits, _ = gpt2_apply(
        params, cfg, inputs_embeds=embeds, dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    cache = init_kv_cache(cfg, B, max_len=16, dtype=jnp.float32)
    # Prefill with the first 5 positions.
    logits_p, cache = gpt2_apply(
        params, cfg, inputs_embeds=embeds[:, :5], kv_cache=cache,
        cache_index=jnp.int32(0), dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :5]), atol=1e-4, rtol=1e-4
    )
    # Decode the remaining tokens one at a time.
    for t in range(5, T):
        step_logits, cache = gpt2_apply(
            params, cfg, inputs_embeds=embeds[:, t : t + 1], kv_cache=cache,
            cache_index=jnp.int32(t), dtype=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]),
            atol=1e-4, rtol=1e-4,
        )


def test_embed_tokens_matches_wte(tiny_jax):
    params, cfg = tiny_jax
    ids = jnp.asarray([[1, 5, 9]])
    out = gpt2_embed_tokens(params, ids)
    np.testing.assert_array_equal(
        np.asarray(out[0, 1]), np.asarray(params["wte"][5])
    )


def test_random_init_shapes():
    cfg = GPT2Config(**TINY)
    params = init_gpt2(cfg, seed=0)
    assert params["h"]["attn"]["c_attn"]["w"].shape == (3, 32, 96)
    logits, _ = gpt2_apply(params, cfg, input_ids=jnp.zeros((1, 4), jnp.int32))
    assert logits.shape == (1, 4, 97)


def test_remat_matches_no_remat(tiny_jax):
    params, cfg = tiny_jax
    embeds = jnp.asarray(np.random.default_rng(4).normal(size=(1, 6, cfg.n_embd)).astype(np.float32))
    a, _ = gpt2_apply(params, cfg, inputs_embeds=embeds, remat=False, dtype=jnp.float32)
    b, _ = gpt2_apply(params, cfg, inputs_embeds=embeds, remat=True, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_flash_decode_matches_xla_path(tiny_jax):
    """The Pallas flash-decode kernel (ops/flash_decode) must reproduce the
    XLA cached-attention path on both the plain and the beam (ancestry
    masked) decode, fp32 exact-ish and bf16 within rounding."""
    import jax

    params, cfg = tiny_jax
    rng = np.random.default_rng(11)

    for dtype, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 5e-2)):
        # Plain batched decode: prefill 5, then one decode step both ways.
        B, P, T = 3, 5, 9
        embeds = jnp.asarray(rng.normal(size=(B, P, cfg.n_embd)), dtype)
        cache = init_kv_cache(cfg, B, max_len=T, dtype=dtype)
        _, cache = gpt2_apply(params, cfg, inputs_embeds=embeds,
                              kv_cache=cache, cache_index=jnp.int32(0),
                              dtype=dtype, flash=False)
        step = jnp.asarray(rng.normal(size=(B, 1, cfg.n_embd)), dtype)
        ref, _ = gpt2_apply(params, cfg, inputs_embeds=step, kv_cache=cache,
                            cache_index=jnp.int32(P), dtype=dtype, flash=False)
        out, _ = gpt2_apply(params, cfg, inputs_embeds=step, kv_cache=cache,
                            cache_index=jnp.int32(P), dtype=dtype, flash=True)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=atol, rtol=1e-3)

        # Beam decode with a nontrivial ancestry table.
        R, K = 2, 3
        Bk = R * K
        pe = jnp.asarray(rng.normal(size=(Bk, P, cfg.n_embd)), dtype)
        bcache = init_kv_cache(cfg, Bk, max_len=T, dtype=dtype, beam_size=K)
        _, bcache = gpt2_apply(params, cfg, inputs_embeds=pe, kv_cache=bcache,
                               cache_index=jnp.int32(0), dtype=dtype,
                               beam_size=K, flash=False)
        ancestry = jnp.asarray(rng.integers(0, K, size=(Bk, T)), jnp.int32)
        bref, _ = gpt2_apply(params, cfg, inputs_embeds=step.repeat(2, 0),
                             kv_cache=bcache, cache_index=jnp.int32(P),
                             dtype=dtype, beam_size=K, ancestry=ancestry,
                             flash=False)
        bout, _ = gpt2_apply(params, cfg, inputs_embeds=step.repeat(2, 0),
                             kv_cache=bcache, cache_index=jnp.int32(P),
                             dtype=dtype, beam_size=K, ancestry=ancestry,
                             flash=True)
        np.testing.assert_allclose(np.asarray(bout, np.float32),
                                   np.asarray(bref, np.float32),
                                   atol=atol, rtol=1e-3)


def test_int8_weight_quantization(tiny_jax):
    """ops/quant: int8 per-channel weights reproduce bf16 logits within a
    small tolerance, and the quantized tree drops weight bytes ~2x."""
    params, cfg = tiny_jax
    from clipcap_tpu.ops.quant import quantize_gpt2_int8

    qparams = quantize_gpt2_int8(params)
    assert qparams["h"]["attn"]["c_attn"]["w"]["q"].dtype == jnp.int8

    rng = np.random.default_rng(5)
    embeds = jnp.asarray(rng.normal(size=(2, 7, cfg.n_embd)), jnp.float32)
    ref, _ = gpt2_apply(params, cfg, inputs_embeds=embeds, dtype=jnp.float32)
    out, _ = gpt2_apply(qparams, cfg, inputs_embeds=embeds, dtype=jnp.float32)
    # int8 per-channel weight error ~0.4%/weight; logits stay close in a
    # 2-layer net.  This pins plumbing, not a quality claim.
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.05, (err, scale)


@pytest.mark.slow
def test_flash_decode_odd_head_count():
    """gpt2-xl has 25 heads — the head-pairing cache pads to 26 with a zero
    head.  Pin flash == XLA on an odd-head config (pad head must never leak
    into outputs), both plain and beam decode."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2

    cfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=96, n_layer=2,
                     n_head=3, name="odd-heads")
    params = init_gpt2(cfg, seed=3)
    rng = np.random.default_rng(7)

    B, P, T = 2, 4, 10
    embeds = jnp.asarray(rng.normal(size=(B, P, cfg.n_embd)), jnp.float32)
    cache = init_kv_cache(cfg, B, max_len=T, dtype=jnp.float32)
    _, cache = gpt2_apply(params, cfg, inputs_embeds=embeds, kv_cache=cache,
                          cache_index=jnp.int32(0), dtype=jnp.float32,
                          flash=False)
    step = jnp.asarray(rng.normal(size=(B, 1, cfg.n_embd)), jnp.float32)
    ref, _ = gpt2_apply(params, cfg, inputs_embeds=step, kv_cache=cache,
                        cache_index=jnp.int32(P), dtype=jnp.float32, flash=False)
    out, _ = gpt2_apply(params, cfg, inputs_embeds=step, kv_cache=cache,
                        cache_index=jnp.int32(P), dtype=jnp.float32, flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)

    R, K = 2, 3
    Bk = R * K
    pe = jnp.asarray(rng.normal(size=(Bk, P, cfg.n_embd)), jnp.float32)
    bcache = init_kv_cache(cfg, Bk, max_len=T, dtype=jnp.float32, beam_size=K)
    _, bcache = gpt2_apply(params, cfg, inputs_embeds=pe, kv_cache=bcache,
                           cache_index=jnp.int32(0), dtype=jnp.float32,
                           beam_size=K, flash=False)
    ancestry = jnp.asarray(rng.integers(0, K, size=(Bk, T)), jnp.int32)
    bstep = jnp.asarray(rng.normal(size=(Bk, 1, cfg.n_embd)), jnp.float32)
    bref, _ = gpt2_apply(params, cfg, inputs_embeds=bstep, kv_cache=bcache,
                         cache_index=jnp.int32(P), dtype=jnp.float32,
                         beam_size=K, ancestry=ancestry, flash=False)
    bout, _ = gpt2_apply(params, cfg, inputs_embeds=bstep, kv_cache=bcache,
                         cache_index=jnp.int32(P), dtype=jnp.float32,
                         beam_size=K, ancestry=ancestry, flash=True)
    np.testing.assert_allclose(np.asarray(bout), np.asarray(bref),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_cached_decode_attention_mask_pads_to_slots(tiny_jax):
    """gpt2_apply pads a [B, max_len] attention_mask to the cache's padded
    slot count (init_kv_cache rounds slots to the u-tile quantum); masked
    slots must be excluded identically on the flash and XLA paths."""
    import jax.numpy as jnp

    params, cfg = tiny_jax
    rng = np.random.default_rng(21)
    B, P, T = 2, 5, 12
    embeds = jnp.asarray(rng.normal(size=(B, P, cfg.n_embd)), jnp.float32)
    cache = init_kv_cache(cfg, B, max_len=T, dtype=jnp.float32)
    assert cache[0].shape[2] == 16  # quantum-padded slots (T=12 -> 16)

    _, cache = gpt2_apply(params, cfg, inputs_embeds=embeds, kv_cache=cache,
                          cache_index=jnp.int32(0), dtype=jnp.float32,
                          flash=False)
    # Logical mask over max_len: hide position 2 of every row.
    mask = np.ones((B, T), np.int32)
    mask[:, 2] = 0
    step = jnp.asarray(rng.normal(size=(B, 1, cfg.n_embd)), jnp.float32)
    outs = {}
    for fl in (False, True):
        outs[fl], _ = gpt2_apply(
            params, cfg, inputs_embeds=step, kv_cache=cache,
            cache_index=jnp.int32(P), dtype=jnp.float32,
            attention_mask=jnp.asarray(mask), flash=fl,
        )
    np.testing.assert_allclose(np.asarray(outs[True]), np.asarray(outs[False]),
                               atol=1e-5, rtol=1e-4)
    # And the mask matters: unmasked differs.
    ref, _ = gpt2_apply(params, cfg, inputs_embeds=step, kv_cache=cache,
                        cache_index=jnp.int32(P), dtype=jnp.float32, flash=False)
    assert np.abs(np.asarray(ref) - np.asarray(outs[False])).max() > 1e-6


@pytest.mark.slow
def test_int8_kv_cache_bounded_drift(tiny_jax):
    """int8 KV cache (per-slot absmax scales): plain and beam decode must
    track the bf16/f32-cache path within int8 rounding, on both the flash
    (interpret) and XLA fallback paths."""
    import jax.numpy as jnp

    params, cfg = tiny_jax
    rng = np.random.default_rng(31)
    B, P, T = 3, 5, 9

    def run(int8, flash):
        embeds = jnp.asarray(rng2.normal(size=(B, P, cfg.n_embd)), jnp.float32)
        cache = init_kv_cache(cfg, B, max_len=T, dtype=jnp.float32, int8=int8)
        _, cache = gpt2_apply(params, cfg, inputs_embeds=embeds,
                              kv_cache=cache, cache_index=jnp.int32(0),
                              dtype=jnp.float32, flash=False)
        out, _ = gpt2_apply(params, cfg, inputs_embeds=step, kv_cache=cache,
                            cache_index=jnp.int32(P), dtype=jnp.float32,
                            flash=flash)
        return np.asarray(out)

    rng2 = np.random.default_rng(31)
    step = jnp.asarray(rng.normal(size=(B, 1, cfg.n_embd)), jnp.float32)
    ref = run(False, False)
    for flash in (False, True):
        rng2 = np.random.default_rng(31)
        got = run(True, flash)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        assert err < 0.03, (flash, err)

    # Beam path: int8 cache through beam_search_batched produces near-
    # identical beams to the fp32 cache on a tiny model.
    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched

    prefix = jnp.asarray(rng.normal(size=(2, 4, cfg.n_embd)) * 0.1, jnp.float32)
    res_fp = beam_search_batched(params, cfg, prefix,
                                 BeamParams(beam_size=3, max_new_tokens=8,
                                            stop_token=0),
                                 dtype=jnp.float32)
    res_q = beam_search_batched(params, cfg, prefix,
                                BeamParams(beam_size=3, max_new_tokens=8,
                                           stop_token=0, int8_kv=True),
                                dtype=jnp.float32)
    assert np.array_equal(np.asarray(res_fp.tokens), np.asarray(res_q.tokens))
    np.testing.assert_allclose(np.asarray(res_q.scores),
                               np.asarray(res_fp.scores), atol=2e-3)


def test_flash_decode_u_valid_contract():
    """Direct kernel contract: with a causal mask covering the invalid
    tail, bounding the dynamic grid to u_valid slots must give the same
    output as contracting the full buffer — for every u_valid, including
    ones that land mid-tile."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import NEG_INF
    from clipcap_tpu.ops.flash_decode import flash_decode

    rng = np.random.default_rng(3)
    R, H, K, Dh, U = 2, 3, 5, 16, 64  # u_tile resolves to 64 (single) ... use 160
    U = 160                            # -> u_tile 80, 2 tiles
    q = jnp.asarray(rng.normal(size=(R, H, K, Dh)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(R, H, U, 2 * Dh)), jnp.float32)

    for u_valid in (1, 40, 80, 81, 159, 160):
        # mask: slots >= u_valid invisible, plus a random sprinkle inside
        # the valid region (slot 0 always stays visible — real decode
        # queries always see at least one slot).
        vis = np.zeros((R, K, U), np.float32)
        vis[:, :, u_valid:] = NEG_INF
        if u_valid > 1:
            drop = rng.integers(1, u_valid, size=(R, K, max(1, u_valid // 4)))
            for r in range(R):
                for k in range(K):
                    vis[r, k, drop[r, k]] = NEG_INF
        mask = jnp.asarray(vis)
        full = flash_decode(q, kv, mask)                      # all tiles
        bounded = flash_decode(q, kv, mask, u_valid=jnp.int32(u_valid))
        np.testing.assert_allclose(np.asarray(bounded), np.asarray(full),
                                   atol=1e-6, rtol=1e-5,
                                   err_msg=f"u_valid={u_valid}")


def test_flash_two_phase_carry_matches_single():
    """The u_lo/carry/return_carry contract behind consolidated-beam
    attention: phase A over a shared buffer + phase B over the live buffer
    resuming from A's partials must equal ONE flash_decode over the union
    context, at every split point (tile-aligned and mid-tile)."""
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import NEG_INF
    from clipcap_tpu.ops.flash_decode import flash_decode

    rng = np.random.default_rng(9)
    R, H, K, Dh, U = 2, 3, 5, 16, 160  # u_tile 80, 2 tiles
    q = jnp.asarray(rng.normal(size=(R, H, K, Dh)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(R, H, U, 2 * Dh)), jnp.float32)
    # A second, independent buffer playing the consolidated shared prefix.
    Sc = 80
    shared = jnp.asarray(rng.normal(size=(R, H, Sc, 2 * Dh)), jnp.float32)

    for c in (0, 1, 40, 79, 80):
        for live_valid in (81, 160):
            sh_mask = np.where(np.arange(Sc) < c, 0.0, NEG_INF)[None, None]
            sh_mask = np.broadcast_to(sh_mask, (1, K, Sc)).astype(np.float32)
            live_mask = np.where(np.arange(U) < live_valid, 0.0, NEG_INF)
            live_mask = np.broadcast_to(live_mask[None, None], (1, K, U)).copy()
            # phase B must not re-see the region phase A served
            live_mask[:, :, : c // 2] = NEG_INF

            carry = flash_decode(q, shared, jnp.asarray(sh_mask),
                                 u_valid=jnp.int32(max(c, 1)),
                                 return_carry=True)
            two = flash_decode(q, kv, jnp.asarray(live_mask),
                               u_valid=jnp.int32(live_valid),
                               u_lo=jnp.int32(c // 2), carry=carry)

            # Oracle: one call over the concatenated context.
            cat_kv = jnp.concatenate([shared, kv], axis=2)
            cat_mask = jnp.asarray(
                np.concatenate([sh_mask, live_mask], axis=2))
            one = flash_decode(q, cat_kv, cat_mask)
            np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"c={c} lv={live_valid}")


@pytest.mark.slow
def test_flash_two_phase_fused_heterogeneous_bounds():
    """Direct fused-kernel contract: per-sample shared lengths, live lows
    and live valid counts (all different across rows, exercising per-block
    min/max bound widening + DMA-eliding repeats) must equal ONE
    flash_decode over the concatenated context."""
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import NEG_INF
    from clipcap_tpu.ops.flash_decode import (
        flash_decode,
        flash_decode_two_phase,
    )

    rng = np.random.default_rng(11)
    R, H, K, Dh = 4, 3, 5, 16
    Sc, U = 80, 160
    q = jnp.asarray(rng.normal(size=(R, H, K, Dh)), jnp.float32)
    shared = jnp.asarray(rng.normal(size=(R, H, Sc, 2 * Dh)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(R, H, U, 2 * Dh)), jnp.float32)

    c = np.array([1, 17, 40, 79], np.int32)          # per-sample shared len
    lv_lo = np.array([0, 30, 85, 100], np.int32)     # first live slot
    lv_valid = np.array([64, 101, 160, 140], np.int32)

    sh_mask = np.full((R, K, Sc), NEG_INF, np.float32)
    live_mask = np.full((R, K, U), NEG_INF, np.float32)
    for r in range(R):
        sh_mask[r, :, : c[r]] = 0.0
        live_mask[r, :, lv_lo[r]: lv_valid[r]] = 0.0
        # a sprinkle of interior holes (ancestry-style)
        holes = rng.integers(lv_lo[r], lv_valid[r], size=5)
        live_mask[r, :, holes] = NEG_INF

    for mbr in (None, 1, 2):
        fused = flash_decode_two_phase(
            q, shared, jnp.asarray(sh_mask), kv, jnp.asarray(live_mask),
            sh_valid=jnp.asarray(c), lv_lo=jnp.asarray(lv_lo),
            lv_valid=jnp.asarray(lv_valid), max_block_rows=mbr)
        one = flash_decode(
            q, jnp.concatenate([shared, kv], axis=2),
            jnp.asarray(np.concatenate([sh_mask, live_mask], axis=2)))
        np.testing.assert_allclose(np.asarray(fused), np.asarray(one),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"max_block_rows={mbr}")


@pytest.mark.slow
def test_consolidated_beam_gpt2_apply_flash_matches_xla():
    """gpt2_apply with shared_kv/shared_len: the Pallas two-phase path must
    reproduce the XLA concat fallback, fp32, including int8 shared+live."""
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import (
        GPT2Config, consolidate_kv_cache, gpt2_apply, init_gpt2,
        init_kv_cache, init_shared_kv)

    cfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=64, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg, seed=1)
    rng = np.random.default_rng(13)
    R, K, P, T = 2, 3, 4, 12
    B = R * K

    for int8 in (False, True):
        pe = jnp.asarray(rng.normal(size=(B, P, cfg.n_embd)), jnp.float32)
        cache = init_kv_cache(cfg, B, max_len=T, dtype=jnp.float32,
                              beam_size=K, int8=int8)
        _, cache = gpt2_apply(params, cfg, inputs_embeds=pe, kv_cache=cache,
                              cache_index=jnp.int32(0), dtype=jnp.float32,
                              beam_size=K, flash=False)
        # Write a few decode positions so the live region is nontrivial.
        anc = np.tile(np.arange(K, dtype=np.int32)[:, None], (R, T)).reshape(B, T)
        for pos in range(P, P + 4):
            step = jnp.asarray(rng.normal(size=(B, 1, cfg.n_embd)), jnp.float32)
            _, cache = gpt2_apply(params, cfg, inputs_embeds=step,
                                  kv_cache=cache, cache_index=jnp.int32(pos),
                                  dtype=jnp.float32, beam_size=K,
                                  ancestry=jnp.asarray(anc), flash=False)

        shared = init_shared_kv(cfg, R, T, dtype=jnp.float32, int8=int8)
        sb0 = shared[0][0] if int8 else shared[0]
        rows = jnp.zeros((R, sb0.shape[2]), jnp.int32)  # converged on row 0
        shared = consolidate_kv_cache(cache, shared, rows, K)
        c = jnp.int32(P + 2)
        # Ancestry consistent with consolidation: row 0 for t < c.
        anc2 = anc.copy()
        anc2[:, : P + 2] = 0
        step = jnp.asarray(rng.normal(size=(B, 1, cfg.n_embd)), jnp.float32)

        outs = {}
        for flash in (False, True):
            outs[flash], _ = gpt2_apply(
                params, cfg, inputs_embeds=step, kv_cache=cache,
                cache_index=jnp.int32(P + 4), dtype=jnp.float32, beam_size=K,
                ancestry=jnp.asarray(anc2), flash=flash,
                shared_kv=shared, shared_len=c)
        np.testing.assert_allclose(np.asarray(outs[True]),
                                   np.asarray(outs[False]),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"int8={int8}")


@pytest.mark.slow
def test_folded_prefix_flash_matches_xla(tiny_jax):
    """Folded-prefix beam cache (prefix once at the buffer head,
    init_kv_cache(prefix_slots=P) + cache_base=P without shared_kv): the
    flash kernel path must match the XLA mask path, and both must match
    the replicated-prefix layout on identical inputs, fp32."""
    params, cfg = tiny_jax
    rng = np.random.default_rng(13)
    R, K, P, N = 2, 3, 5, 7
    Bk = R * K
    dtype = jnp.float32

    pre = jnp.asarray(rng.normal(size=(R, P, cfg.n_embd)), dtype)
    # Folded: beam_size-free prefill over [R, P, D] into slots [0, P).
    fcache = init_kv_cache(cfg, Bk, max_len=N, dtype=dtype, beam_size=K,
                           prefix_slots=P)
    _, fcache = gpt2_apply(params, cfg, inputs_embeds=pre, kv_cache=fcache,
                           cache_index=jnp.int32(0), dtype=dtype, flash=False)
    # Replicated reference: prefill all K rows.
    rcache = init_kv_cache(cfg, Bk, max_len=P + N, dtype=dtype, beam_size=K)
    _, rcache = gpt2_apply(params, cfg,
                           inputs_embeds=jnp.repeat(pre, K, axis=0),
                           kv_cache=rcache, cache_index=jnp.int32(0),
                           dtype=dtype, beam_size=K, flash=False)

    # Two decode steps with a nontrivial ancestry over generated positions.
    anc_gen = jnp.asarray(rng.integers(0, K, size=(Bk, N)), jnp.int32)
    anc_abs = jnp.concatenate(  # replicated layout: own-row for the prefix
        [jnp.broadcast_to((jnp.arange(Bk, dtype=jnp.int32) % K)[:, None],
                          (Bk, P)), anc_gen], axis=1)
    out_f = out_ff = out_r = None
    for s in range(2):
        step = jnp.asarray(rng.normal(size=(Bk, 1, cfg.n_embd)), dtype)
        ci = jnp.int32(P + s)
        out_f, fcache = gpt2_apply(params, cfg, inputs_embeds=step,
                                   kv_cache=fcache, cache_index=ci,
                                   dtype=dtype, beam_size=K, ancestry=anc_gen,
                                   cache_base=P, flash=False)
        out_ff, _ = gpt2_apply(params, cfg, inputs_embeds=step,
                               kv_cache=fcache, cache_index=ci, dtype=dtype,
                               beam_size=K, ancestry=anc_gen, cache_base=P,
                               flash=True)
        out_r, rcache = gpt2_apply(params, cfg, inputs_embeds=step,
                                   kv_cache=rcache, cache_index=ci,
                                   dtype=dtype, beam_size=K, ancestry=anc_abs,
                                   flash=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_ff), np.asarray(out_f),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_head_major_qkv_packing_parity():
    """pack_qkv_head_major is a pure layout permutation: full-sequence
    logits AND cached beam decode are bitwise-comparable (fp32) to the
    plain q|k|v packing, and unpack restores the original tree exactly."""
    from clipcap_tpu.parallel.tp import pack_qkv_head_major, unpack_qkv_head_major

    cfg = GPT2Config(vocab_size=203, n_positions=64, n_embd=48, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg, seed=3)
    hparams, hcfg = pack_qkv_head_major(params, cfg)
    assert hcfg.qkv_packing == "head"

    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 203, size=(3, 11)), jnp.int32)
    ref, _ = gpt2_apply(params, cfg, input_ids=ids, dtype=jnp.float32)
    got, _ = gpt2_apply(hparams, hcfg, input_ids=ids, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # Cached decode path (beam mode exercises _cached_block's unpack).
    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched

    pre = jnp.asarray(rng.normal(size=(2, 5, 48)), jnp.float32)
    bp = BeamParams(beam_size=3, max_new_tokens=8, stop_token=7)
    r0 = beam_search_batched(params, cfg, pre, bp, dtype=jnp.float32)
    r1 = beam_search_batched(hparams, hcfg, pre, bp, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r0.tokens))

    # Round trip restores the export layout exactly.
    back, bcfg = unpack_qkv_head_major(hparams, hcfg)
    assert bcfg.qkv_packing == "qkv"
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_decode_manual_pipeline_matches_auto():
    """The manual-pipeline kernel form (``flash_decode(..., manual=True)``:
    in-kernel tile loop with explicitly double-buffered async DMA from the
    HBM-resident cache — ``_manual_kernel``) must match the auto-pipeline
    kernel on both cache layouts (strided 4-D and tile-major 5-D), at
    every u_valid boundary, with broadcast and per-row masks."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import NEG_INF
    from clipcap_tpu.ops.flash_decode import flash_decode

    rng = np.random.default_rng(11)
    R, H, K, Dh, U = 4, 3, 5, 64, 192                 # u_tile 96, 2 tiles
    ut = 96
    q = jnp.asarray(rng.normal(size=(R, H, K, Dh)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(R, H, U, 2 * Dh)), jnp.float32)
    kv5 = kv.reshape(R, H, U // ut, ut, 2 * Dh).transpose(0, 2, 1, 3, 4)

    for u_valid in (1, 95, 96, 97, 191, 192):
        vis = np.zeros((R, K, U), np.float32)
        vis[:, :, u_valid:] = NEG_INF
        mask = jnp.asarray(vis)
        ref = flash_decode(q, kv, mask, u_valid=jnp.int32(u_valid))
        for form, kvx in (("strided", kv), ("tile-major", kv5)):
            got = flash_decode(q, kvx, mask, u_valid=jnp.int32(u_valid),
                               manual=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-5,
                err_msg=f"manual {form} u_valid={u_valid}")

    # Per-row (ancestry-shaped) masks through the Rm > 1 spec path.
    vis = (np.asarray(rng.normal(size=(R, K, U)) > 0.4, np.float32)
           * NEG_INF)
    vis[:, :, 0] = 0.0
    mask = jnp.asarray(vis)
    ref = flash_decode(q, kv, mask, u_valid=jnp.int32(150))
    for kvx in (kv, kv5):
        got = flash_decode(q, kvx, mask, u_valid=jnp.int32(150), manual=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)


def test_flash_decode_manual_k1_sampling_shape():
    """Manual-pipeline kernel on the batched-sampling shape (K=1 query per
    row, broadcast causal mask) — the engine.decode flash path."""
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import NEG_INF
    from clipcap_tpu.ops.flash_decode import flash_decode

    rng = np.random.default_rng(13)
    R, H, K, Dh, U = 6, 4, 1, 64, 160                  # u_tile 80, 2 tiles
    q = jnp.asarray(rng.normal(size=(R, H, K, Dh)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(R, H, U, 2 * Dh)), jnp.float32)
    for uv in (1, 79, 80, 81, 160):
        vis = np.zeros((1, K, U), np.float32)
        vis[:, :, uv:] = NEG_INF
        mask = jnp.asarray(vis)
        ref = flash_decode(q, kv, mask, u_valid=jnp.int32(uv))
        got = flash_decode(q, kv, mask, u_valid=jnp.int32(uv), manual=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5, err_msg=str(uv))
