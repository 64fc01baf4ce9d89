"""Pallas kernel tests (interpret mode on the CPU mesh).

The fused AdamW kernel (clipcap_tpu/ops/fused_adamw.py) must be numerically
identical to optax.adamw — same bias-corrected update, decoupled weight
decay — so it can be swapped in via ``--fused-optimizer`` without changing
training math (the reference's DeepSpeed FusedAdam with adam_w_mode=True is
likewise AdamW-exact, model.py:72-74).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clipcap_tpu.ops.fused_adamw import fused_adamw


def _tree_allclose(a, b, atol):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=0)


def _make_params(rng):
    # Mix of shapes: 128-divisible (copy-free path), ragged (pad path),
    # scalar, and a matrix — exercises every _apply_leaf branch.
    return {
        "w": jnp.asarray(rng.standard_normal((64, 128)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((37,)), jnp.float32),
        "scale": jnp.asarray(rng.standard_normal(()), jnp.float32),
        "nested": {"k": jnp.asarray(rng.standard_normal((3, 5, 7)), jnp.float32)},
    }


@pytest.mark.slow
@pytest.mark.parametrize("schedule", ["const", "callable"])
def test_fused_adamw_matches_optax(rng, schedule):
    params = _make_params(rng)
    lr = 1e-3 if schedule == "const" else (lambda step: 1e-3 / (1.0 + 0.1 * step))
    ref_tx = optax.adamw(learning_rate=lr, weight_decay=0.01)
    fused_tx = fused_adamw(learning_rate=lr, weight_decay=0.01)

    ref_state = ref_tx.init(params)
    fused_state = fused_tx.init(params)

    p_ref, p_fused = params, params
    for step in range(4):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(step).standard_normal(p.shape), jnp.float32
            ),
            params,
        )
        u_ref, ref_state = ref_tx.update(grads, ref_state, p_ref)
        u_fused, fused_state = fused_tx.update(grads, fused_state, p_fused)
        _tree_allclose(u_ref, u_fused, atol=1e-6)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fused = optax.apply_updates(p_fused, u_fused)

    _tree_allclose(p_ref, p_fused, atol=1e-6)


def test_fused_adamw_under_jit_and_chain(rng):
    """Composes with clip_by_global_norm inside a jitted step, like train.py."""
    params = _make_params(rng)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), fused_adamw(learning_rate=1e-3)
    )
    ref = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate=1e-3, weight_decay=0.01),
    )
    state = tx.init(params)
    ref_state = ref.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 3.0, params)

    @jax.jit
    def step(g, s, p):
        u, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, u), s2

    @jax.jit
    def ref_step(g, s, p):
        u, s2 = ref.update(g, s, p)
        return optax.apply_updates(p, u), s2

    new_p, _ = step(grads, state, params)
    ref_p, _ = ref_step(grads, ref_state, params)
    _tree_allclose(new_p, ref_p, atol=1e-6)


def test_fused_adamw_prefix_only_multi_transform(rng):
    """multi_transform('train'/'freeze') — the prefix-only path in state.py."""
    params = {
        "mapper": {"w": jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)},
        "lm": {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)},
    }

    def label_fn(p):
        return {
            "mapper": jax.tree_util.tree_map(lambda _: "train", p["mapper"]),
            "lm": jax.tree_util.tree_map(lambda _: "freeze", p["lm"]),
        }

    tx = optax.multi_transform(
        {"train": fused_adamw(1e-3), "freeze": optax.set_to_zero()}, label_fn
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["lm"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["mapper"]["w"]).max()) > 0.0


# ---------------------------------------------------------------------------
# Fused SDPA (ops/attention.py)
# ---------------------------------------------------------------------------


def _xla_sdpa(q, k, v, scale, causal):
    from clipcap_tpu.ops.attention import sdpa

    return sdpa(q, k, v, scale=scale, causal=causal, fused=False)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("n", [7, 51, 64, 130])
def test_fused_sdpa_matches_xla(rng, causal, n):
    from clipcap_tpu.ops.attention import sdpa

    B, H, Dh = 3, 4, 64
    q = jnp.asarray(rng.standard_normal((B, n, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, n, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, n, H, Dh)), jnp.float32)

    ref = _xla_sdpa(q, k, v, None, causal)
    out = sdpa(q, k, v, causal=causal, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_sdpa_rejects_long_rows(rng):
    from clipcap_tpu.ops.attention import fused_sdpa

    q = jnp.zeros((1, 1, 600, 64), jnp.float32)
    with pytest.raises(ValueError):
        fused_sdpa(q, q, q)


def test_clip_folded_pixel_norm_matches_explicit(rng):
    """Folding (x-mean)/std into the patch-embed weights must reproduce the
    explicit normalization path, for float AND uint8 inputs."""
    import clipcap_tpu.models.clip_vit as cv

    cfg = cv.CLIPVisionConfig(image_size=32, patch_size=16, width=64,
                              layers=2, heads=4, embed_dim=32)
    params = cv.init_clip_vision(cfg, seed=0)
    imgs_f = rng.random((2, 32, 32, 3)).astype(np.float32)

    out_folded = cv.clip_encode_image(params, cfg, jnp.asarray(imgs_f),
                                      dtype=jnp.float32)

    # Explicit path: pre-normalize on the host, disable the fold.
    mean = np.asarray(cv.IMAGE_MEAN, np.float32)
    std = np.asarray(cv.IMAGE_STD, np.float32)
    explicit = (imgs_f - mean) / std
    out_explicit = cv.clip_encode_image(params, cfg, jnp.asarray(explicit),
                                        dtype=jnp.float32,
                                        normalize_pixels=False)
    np.testing.assert_allclose(np.asarray(out_folded), np.asarray(out_explicit),
                               atol=1e-4, rtol=1e-4)

    # uint8 path folds the /255 too.
    imgs_u8 = (imgs_f * 255).astype(np.uint8)
    out_u8 = cv.clip_encode_image(params, cfg, jnp.asarray(imgs_u8),
                                  dtype=jnp.float32)
    explicit_u8 = (imgs_u8.astype(np.float32) / 255.0 - mean) / std
    ref_u8 = cv.clip_encode_image(params, cfg, jnp.asarray(explicit_u8),
                                  dtype=jnp.float32, normalize_pixels=False)
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(ref_u8),
                               atol=1e-4, rtol=1e-4)


def test_sdpa_packed_matches_unfused(rng):
    """The packed-qkv kernel (interpret mode here) must reproduce the XLA
    attention middle it replaces in the towers (ops/attention.sdpa_packed;
    shipped default on TPU for the unbiased encoder blocks)."""
    from clipcap_tpu.ops.attention import sdpa, sdpa_packed

    B, N, heads, Dh = 4, 50, 4, 32
    D = heads * Dh
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)).astype(np.float32))
    got = sdpa_packed(qkv, heads)
    q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
    want = sdpa(q, k, v, fused=False).reshape(B, N, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # causal form (text-tower shape)
    got_c = sdpa_packed(qkv, heads, causal=True)
    want_c = sdpa(q, k, v, causal=True, fused=False).reshape(B, N, D)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_clip_forward_packed_attention_matches_xla(rng, monkeypatch):
    """clip_encode_image with CLIPCAP_FUSED_ATTN=1 (packed-qkv Pallas path,
    interpret mode on CPU) must match the XLA path — the on-TPU default
    routes through this kernel (models/clip_vit._packed_attn_enabled)."""
    import clipcap_tpu.models.clip_vit as cv

    cfg = cv.CLIPVisionConfig(image_size=32, patch_size=16, width=64,
                              layers=2, heads=4, embed_dim=32)
    params = cv.init_clip_vision(cfg, seed=0)
    imgs = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)

    monkeypatch.setenv("CLIPCAP_FUSED_ATTN", "0")
    want = np.asarray(cv.clip_encode_image(params, cfg, jnp.asarray(imgs),
                                           dtype=jnp.float32))
    monkeypatch.setenv("CLIPCAP_FUSED_ATTN", "1")
    got = np.asarray(cv.clip_encode_image(params, cfg, jnp.asarray(imgs),
                                          dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    # text tower: causal flag routes through the kernel too
    tcfg = cv.CLIPTextConfig(vocab_size=128, context_length=16, width=64,
                             layers=2, heads=4, embed_dim=32)
    tparams = cv.init_clip_text(tcfg, seed=1)
    toks = np.zeros((3, 16), np.int32)
    toks[:, :5] = rng.integers(1, 127, (3, 5))
    monkeypatch.setenv("CLIPCAP_FUSED_ATTN", "0")
    twant = np.asarray(cv.clip_encode_text(tparams, tcfg, jnp.asarray(toks),
                                           dtype=jnp.float32))
    monkeypatch.setenv("CLIPCAP_FUSED_ATTN", "1")
    tgot = np.asarray(cv.clip_encode_text(tparams, tcfg, jnp.asarray(toks),
                                          dtype=jnp.float32))
    np.testing.assert_allclose(tgot, twant, atol=2e-5, rtol=2e-5)


def test_sdpa_packed_stripe_long_rows(rng):
    """Rows too long for the whole-row VMEM budget (ViT-L/14's 257 tokens)
    route to the 128-lane stripe kernel — lane-blocked specs over the same
    packed array.  Covers both sub-head widths (Dh=64 -> 2 heads/stripe,
    Dh=128 -> 1)."""
    from clipcap_tpu.ops import attention as at

    for heads, Dh in ((4, 64), (4, 128)):
        D = heads * Dh
        B, N = 2, 600
        assert at._packed_group(B, N, D, heads) is None  # stripe path taken
        qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)).astype(np.float32))
        got = at.sdpa_packed(qkv, heads)
        q, k, v = (t.reshape(B, N, heads, Dh) for t in jnp.split(qkv, 3, -1))
        want = at.sdpa(q, k, v, fused=False).reshape(B, N, D)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)
        got_c = at.sdpa_packed(qkv, heads, causal=True)
        want_c = at.sdpa(q, k, v, causal=True, fused=False).reshape(B, N, D)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   atol=3e-5, rtol=3e-5)


@pytest.mark.slow
def test_clip_int8_fidelity(rng, monkeypatch):
    """w8a8 ViT path (--int8-encoder): quantized forward must track the
    fp32 forward closely (per-token activation + per-channel weight int8
    on the block projections only) and wire through CLIPEncoder."""
    import clipcap_tpu.models.clip_vit as cv
    from clipcap_tpu.ops.quant import quantize_clip_visual_int8

    monkeypatch.setenv("CLIPCAP_FUSED_ATTN", "0")  # XLA attention on CPU
    cfg = cv.CLIPVisionConfig(image_size=32, patch_size=16, width=64,
                              layers=2, heads=4, embed_dim=32)
    params = cv.init_clip_vision(cfg, seed=0)
    imgs = (rng.random((8, 32, 32, 3)) * 255).astype(np.uint8)

    want = np.asarray(cv.clip_encode_image(params, cfg, jnp.asarray(imgs),
                                           dtype=jnp.float32), np.float32)
    qparams = quantize_clip_visual_int8(params)
    # quantized leaves: int8 q + fp32 per-(layer, channel) scales
    assert qparams["blocks"]["attn"]["in_proj"]["w"]["q"].dtype == jnp.int8
    assert qparams["blocks"]["attn"]["in_proj"]["w"]["s"].shape == (2, 3 * 64)
    got = np.asarray(cv.clip_encode_image(qparams, cfg, jnp.asarray(imgs),
                                          dtype=jnp.float32, int8_acts=True),
                     np.float32)
    cos = (want * got).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-9)
    assert cos.min() > 0.995, cos

    # Encoder-surface wiring: CLIPEncoder(int8=True) quantizes once and runs
    from clipcap_tpu.encoders.clip import CLIPEncoder

    full = {"visual": params}
    ccfg = cv.CLIPConfig(name="tiny", vision=cfg, text=cv.CLIPTextConfig())
    enc = CLIPEncoder(full, ccfg, int8=True, dtype=jnp.float32)
    out = enc(imgs)
    assert out.shape == (8, 32) and np.isfinite(out).all()
    cos2 = (want * out).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9)
    assert cos2.min() > 0.995

    # CLAP rejects the flag with a clear error
    from clipcap_tpu.encoders.base import get_encoder

    with pytest.raises(ValueError, match="CLIP-only"):
        get_encoder("clap", "HTSAT-tiny", int8=True)


@pytest.mark.slow
def test_int8_rerank_uses_w8a8_path(rng, monkeypatch):
    """ADVICE r4: CLIPEncoder(int8=True).similarity must run the visual
    tower through the same w8a8 path as embedding extraction — the
    quantized tree with int8_acts threaded — not a silent weight-only
    dequant variant.  Pin: similarity on the int8 encoder equals
    clip_similarity(int8_acts=True) on the quantized tree exactly, and
    tracks the fp32 rerank closely."""
    import clipcap_tpu.models.clip_vit as cv
    from clipcap_tpu.encoders.clip import CLIPEncoder
    from clipcap_tpu.ops.quant import quantize_clip_visual_int8
    from clipcap_tpu.utils.clip_tokenizer import tokenize

    monkeypatch.setenv("CLIPCAP_FUSED_ATTN", "0")
    vcfg = cv.CLIPVisionConfig(image_size=32, patch_size=16, width=64,
                               layers=2, heads=4, embed_dim=32)
    tcfg = cv.CLIPTextConfig(vocab_size=49408, context_length=77, width=64,
                             layers=2, heads=4, embed_dim=32)
    params = {"visual": cv.init_clip_vision(vcfg, seed=0),
              "text": cv.init_clip_text(tcfg, seed=1),
              "logit_scale": jnp.asarray(2.0, jnp.float32)}
    ccfg = cv.CLIPConfig(name="tiny", vision=vcfg, text=tcfg)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    captions = ["a dog on a bench", "a red car"]

    enc = CLIPEncoder(params, ccfg, int8=True, dtype=jnp.float32)
    got = enc.similarity(img, captions)

    qtree = {**params, "visual": quantize_clip_visual_int8(params["visual"])}
    want_q, _ = cv.clip_similarity(qtree, ccfg, jnp.asarray(img)[None],
                                   jnp.asarray(tokenize(captions)),
                                   dtype=jnp.float32, int8_acts=True)
    np.testing.assert_array_equal(got, np.asarray(want_q)[0])

    enc_fp = CLIPEncoder(params, ccfg, int8=False, dtype=jnp.float32)
    want_fp = enc_fp.similarity(img, captions)
    assert got.shape == want_fp.shape == (2,)
    # same ranking, close logits
    assert np.argsort(got).tolist() == np.argsort(want_fp).tolist()
    np.testing.assert_allclose(got, want_fp, rtol=0.05, atol=0.25)


def test_quantize_projections_passes_unknown_keys_through():
    """ADVICE r4: quantize_clip_visual_int8/quantize_gpt2_int8 must copy
    unrecognized block keys untouched instead of dropping them (a dropped
    key surfaces as a tree mismatch deep inside lax.scan)."""
    import clipcap_tpu.models.clip_vit as cv
    from clipcap_tpu.ops.quant import quantize_clip_visual_int8

    cfg = cv.CLIPVisionConfig(image_size=32, patch_size=16, width=64,
                              layers=2, heads=4, embed_dim=32)
    params = cv.init_clip_vision(cfg, seed=0)
    marker = jnp.ones((2, 3))
    params["blocks"]["future_knob"] = marker

    q = quantize_clip_visual_int8(params)
    assert "future_knob" in q["blocks"]
    np.testing.assert_array_equal(np.asarray(q["blocks"]["future_knob"]),
                                  np.asarray(marker))
    # the projections are still quantized
    assert q["blocks"]["attn"]["in_proj"]["w"]["q"].dtype == jnp.int8
    # layer norms untouched
    np.testing.assert_array_equal(
        np.asarray(q["blocks"]["ln_1"]["scale"]),
        np.asarray(params["blocks"]["ln_1"]["scale"]))


def test_quantize_rows_clips_to_int8_range(rng):
    """ADVICE r4: the activation quantizer clips before the int8 cast, so a
    future scale change can never wrap silently."""
    from clipcap_tpu.ops.quant import quantize_rows

    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32)) * 100.0
    q, s = quantize_rows(x)
    qn = np.asarray(q)
    assert qn.min() >= -127 and qn.max() <= 127
    np.testing.assert_allclose(np.asarray(q).astype(np.float32) * np.asarray(s),
                               np.asarray(x), rtol=0.02, atol=1.0)


def test_pick_u_tile_override_semantics(monkeypatch):
    """ADVICE r4: CLIPCAP_FLASH_U_TILE must stay sweepable on <=128-slot
    buffers, and an unaligned override still yields sublane-aligned tiles."""
    import importlib

    import clipcap_tpu.ops.flash_decode as fd

    # default: single-tile shortcut for small buffers
    monkeypatch.delenv("CLIPCAP_FLASH_U_TILE", raising=False)
    importlib.reload(fd)
    assert fd._pick_u_tile(80) == 80

    # override 16: honored even on an 80-slot buffer
    monkeypatch.setenv("CLIPCAP_FLASH_U_TILE", "16")
    importlib.reload(fd)
    assert fd._pick_u_tile(80) == 16

    # unaligned override 40 on a 400-slot buffer: the above-cap fallback
    # must return a sublane-aligned divisor (80), never 50/40
    monkeypatch.setenv("CLIPCAP_FLASH_U_TILE", "40")
    importlib.reload(fd)
    t = fd._pick_u_tile(400)
    assert t % fd._SUBLANE == 0 and 400 % t == 0, t

    # explicit cap is always honored (two-phase consolidation contract)
    assert fd._pick_u_tile(80, cap=16) == 16

    monkeypatch.delenv("CLIPCAP_FLASH_U_TILE", raising=False)
    importlib.reload(fd)


# ---------------------------------------------------------------------------
# Fused uint8 im2col + matmul patch embedding (ops/patch_embed.py)
# ---------------------------------------------------------------------------


def test_patch_embed_fused_matches_patchify(rng):
    """The Pallas patch-embed kernel is the shipping patchify+matmul up to
    fp32 summation order: same bf16 pixel/weight rounding, fp32 accumulate."""
    from clipcap_tpu.models.clip_vit import patchify
    from clipcap_tpu.ops.layers import linear
    from clipcap_tpu.ops.patch_embed import patch_embed_fused

    B, H, W, P, D = 3, 32, 48, 16, 64
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.uint8)
    w = jnp.asarray(rng.standard_normal((3 * P * P, D)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)

    ref = linear(patchify(imgs.astype(jnp.bfloat16), P), w,
                 bias.astype(jnp.bfloat16), None)
    out = patch_embed_fused(imgs, w, bias, P, out_dtype=jnp.bfloat16)
    assert out.shape == (B, (H // P) * (W // P), D)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.3, rtol=0.03)


@pytest.mark.slow
def test_patch_kernel_in_clip_forward(rng, monkeypatch):
    """CLIPCAP_PATCH_KERNEL=1 routes the ViT front end through the kernel
    and reproduces the shipping forward (test-tiny, both pixel modes)."""
    import clipcap_tpu.models.clip_vit as cv

    cfg = cv.get_clip_config("test-tiny").vision
    params = cv.init_clip_vision(cfg, seed=0)
    imgs = jnp.asarray(rng.integers(0, 256, (3, cfg.image_size,
                                             cfg.image_size, 3)), jnp.uint8)
    for norm in (True, False):
        monkeypatch.delenv("CLIPCAP_PATCH_KERNEL", raising=False)
        ref = np.asarray(cv.clip_encode_image(params, cfg, imgs,
                                              dtype=jnp.bfloat16,
                                              normalize_pixels=norm),
                         np.float32)
        monkeypatch.setenv("CLIPCAP_PATCH_KERNEL", "1")
        out = np.asarray(cv.clip_encode_image(params, cfg, imgs,
                                              dtype=jnp.bfloat16,
                                              normalize_pixels=norm),
                         np.float32)
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() <= 0.02 * scale


def test_patch_embed_supported_gating():
    from clipcap_tpu.ops.patch_embed import patch_embed_supported

    u8 = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    assert patch_embed_supported(u8, 16)
    assert not patch_embed_supported(u8.astype(jnp.bfloat16), 16)  # float input
    assert not patch_embed_supported(u8, 15)                       # ragged grid
    assert not patch_embed_supported(u8[..., :1], 16)              # not RGB
