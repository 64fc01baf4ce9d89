"""CLAP audio stack: audio ops (load/mono/resample/mel), HTSAT forward
shapes, swin window math, end-to-end audio preprocess."""
import io
import os
import sys
import wave

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_wav(path_or_buf, rate=16000, seconds=0.5, channels=1, freq=440.0):
    t = np.arange(int(rate * seconds)) / rate
    sig = 0.5 * np.sin(2 * np.pi * freq * t)
    data = np.stack([sig] * channels, axis=1)
    pcm = (data * 32767).astype("<i2")
    with wave.open(path_or_buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def test_load_audio_wav_roundtrip(tmp_path):
    from clipcap_tpu.ops.audio import load_audio, to_mono

    path = str(tmp_path / "t.wav")
    _write_wav(path, rate=8000, seconds=0.25, channels=2)
    data, rate = load_audio(path)
    assert rate == 8000
    assert data.shape == (2000, 2)
    mono = to_mono(data)
    assert mono.shape == (2000,)
    # stereo channels are identical → mono == channel 0
    np.testing.assert_allclose(mono, data[:, 0], atol=1e-6)


def test_resample_preserves_sine_frequency():
    from clipcap_tpu.ops.audio import resample

    rate_in, rate_out = 16000, 48000
    t = np.arange(rate_in) / rate_in
    sig = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = resample(sig, rate_in, rate_out)
    assert abs(len(out) - rate_out) <= 2

    # Dominant FFT bin should still be 440 Hz.
    spec = np.abs(np.fft.rfft(out[: rate_out]))
    peak_hz = np.argmax(spec) * rate_out / rate_out
    assert abs(peak_hz - 440.0) < 2.0

    # Downsample path too.
    back = resample(out, rate_out, rate_in)
    spec2 = np.abs(np.fft.rfft(back[:rate_in]))
    assert abs(np.argmax(spec2) - 440) < 2


def test_log_mel_spectrogram_shapes_and_tone():
    import jax.numpy as jnp

    from clipcap_tpu.ops.audio import CLAP_HOP, CLAP_N_MELS, log_mel_spectrogram

    sr = 48000
    t = np.arange(sr) / sr
    sig = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(sig[None])))
    frames = 1 + sr // CLAP_HOP
    assert mel.shape == (1, frames, CLAP_N_MELS)
    # A 1 kHz tone concentrates energy in a consistent mel band over time.
    peak_bands = mel[0].argmax(axis=1)
    assert np.std(peak_bands[5:-5]) < 1.0
    # Log scale: silence floors at -100 dB.
    silent = np.asarray(log_mel_spectrogram(jnp.zeros((1, sr), jnp.float32)))
    assert silent.max() == pytest.approx(-100.0)


def test_mel_filterbank_matches_librosa_shape():
    from clipcap_tpu.ops.audio import mel_filterbank

    fb = mel_filterbank()
    assert fb.shape == (64, 513)
    assert (fb >= 0).all()
    # every fft bin inside [fmin, fmax] is covered by some filter
    freqs = np.linspace(0, 24000, 513)
    covered = fb.sum(axis=0) > 0
    inside = (freqs > 60) & (freqs < 13900)
    assert covered[inside].all()


def test_swin_window_roundtrip():
    import jax.numpy as jnp

    from clipcap_tpu.models.htsat import _window_partition, _window_reverse

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    w = _window_partition(x, 4)
    assert w.shape == (2 * 16, 16, 8)
    back = _window_reverse(w, 4, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_htsat_tiny_forward_shapes():
    import jax.numpy as jnp

    from clipcap_tpu.models.htsat import (
        clap_audio_embedding, get_htsat_config, init_htsat,
    )

    cfg = get_htsat_config("test-tiny")
    params = init_htsat(cfg, seed=0)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 48000)).astype(np.float32) * 0.1)
    emb = clap_audio_embedding(params, cfg, wav)
    assert emb.shape == (2, cfg.embedding_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_clap_encoder_and_transform(tmp_path):
    from clipcap_tpu.encoders.clap import get_clap_encoder
    from clipcap_tpu.ops.audio import CLAP_CLIP_SAMPLES

    model, transform = get_clap_encoder("test-tiny")
    path = str(tmp_path / "a.wav")
    _write_wav(path, rate=16000, seconds=0.3, channels=2)
    sample = transform(path)
    assert sample.shape == (CLAP_CLIP_SAMPLES,)
    out = model(np.stack([sample, sample]))
    assert out.shape == (2, model.embedding_size)
    np.testing.assert_allclose(out[0], out[1], atol=1e-5)


def test_clap_preprocess_pipeline(tmp_path):
    """Audio files → preprocess CLI → embeddings on disk (the AudioCaps/
    Clotho config shape, BASELINE.json config #3)."""
    import pandas as pd
    from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter

    from clipcap_tpu.encoders.args import add_encoder_args
    from clipcap_tpu.preprocess.args import add_preprocess_args
    from clipcap_tpu.preprocess.preprocess import preprocess

    raw = tmp_path / "audio"
    raw.mkdir()
    for i in range(4):
        _write_wav(str(raw / f"clip_{i}.wav"), rate=16000, seconds=0.2)
        (raw / f"clip_{i}.txt").write_text(f"a sound number {i}")

    out = str(tmp_path / "ds")
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_preprocess_args(parser)
    parser = add_encoder_args(parser)
    args = parser.parse_args([
        "--input-dataset", str(raw), "--output-folder", out,
        "--input-format", "files", "--batch-size", "2", "--workers", "1",
        "--media-file-extensions", "wav",
        "--encoder-model-name", "clap", "--encoder-model-variant", "test-tiny",
    ])
    assert preprocess(args) == 0
    embeds = np.load(os.path.join(out, "embeddings", "embeds_0.npy"))
    caps = pd.read_parquet(os.path.join(out, "captions", "captions_0.parquet"))
    assert embeds.shape[0] == 4 and embeds.shape[1] == 16
    assert len(caps) == 4


@pytest.mark.slow
def test_clap_text_tower_and_similarity(tmp_path):
    """The CLAP rerank path: tokenize captions -> RoBERTa -> projection ->
    cosine similarity against the audio embedding (the working version of
    the reference demo's crash-prone rerank, demo.py:47-66)."""
    import numpy as np

    from clipcap_tpu.encoders.clap import get_clap_encoder

    model, transform = get_clap_encoder("test-tiny")

    # text embeddings: right shape, unit norm, deterministic
    embs = model.encode_text(["a dog barks", "rain falls on a roof"])
    assert embs.shape == (2, model.embedding_size)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, atol=1e-5)
    embs2 = model.encode_text(["a dog barks", "rain falls on a roof"])
    np.testing.assert_allclose(embs, embs2, atol=0)

    # similarity: one score per caption, in [-1, 1]
    rng = np.random.default_rng(0)
    wave = rng.normal(size=(transform.num_samples,)).astype(np.float32) \
        if hasattr(transform, "num_samples") else rng.normal(size=(48000,)).astype(np.float32)
    sims = model.similarity(wave, ["a dog barks", "rain falls", "silence"])
    assert sims.shape == (3,)
    assert np.all(np.abs(sims) <= 1.0 + 1e-5)


def test_htsat_import_parity_vs_torch_oracle():
    """Same-weights forward parity for the HTSAT trunk + audio projection.

    laion_clap itself is not installable offline, so the oracle is a
    minimal torch Swin written here from the published HTS-AT/Swin
    structure, exporting its state_dict under the exact laion_clap key
    names (``audio_branch.*`` / ``audio_projection.*``).  This
    cross-checks the weight-import layout (nn.Linear [out,in] transposes,
    conv patchify flattening, merge concat order, relative-bias indexing)
    against an independent implementation — the realistic silent-failure
    modes of checkpoint import.  The mel input is created at the folded
    target size so the bicubic-resize step is a no-op on both sides
    (jax.image.resize and F.interpolate disagree on antialiasing).
    """
    import torch
    import torch.nn.functional as F
    import jax.numpy as jnp

    from clipcap_tpu.models.htsat import (
        HTSATConfig, htsat_latent, htsat_params_from_laion_clap,
        _rel_position_index, _shift_mask,
    )
    from clipcap_tpu.ops.layers import linear as jlinear

    # n_mels == spec/freq_ratio so the bicubic resize is a no-op.
    cfg = HTSATConfig(spec_size=64, embed_dim=16, depths=(1, 1),
                      heads=(2, 4), window_size=4, freq_ratio=4, n_mels=16,
                      latent_dim=32, embedding_dim=16, name="oracle-tiny")
    torch.manual_seed(0)

    # ---- torch oracle modules (laion_clap layout) ----
    D, p, ws, fr = cfg.embed_dim, cfg.patch_size, cfg.window_size, cfg.freq_ratio
    S = cfg.spec_size
    depths, heads = cfg.depths, cfg.heads

    sd = {}

    def reg(name, t):
        sd[name] = t

    bn_w = torch.randn(cfg.n_mels).abs() + 0.5
    bn_b = torch.randn(cfg.n_mels) * 0.1
    bn_m = torch.randn(cfg.n_mels) * 0.1
    bn_v = torch.rand(cfg.n_mels) + 0.5
    for n, t in (("weight", bn_w), ("bias", bn_b),
                 ("running_mean", bn_m), ("running_var", bn_v)):
        reg(f"audio_branch.bn0.{n}", t)

    pe_w = torch.randn(D, 1, p, p) * 0.05
    pe_b = torch.randn(D) * 0.02
    reg("audio_branch.patch_embed.proj.weight", pe_w)
    reg("audio_branch.patch_embed.proj.bias", pe_b)
    pe_ln_w = torch.randn(D).abs() + 0.5
    pe_ln_b = torch.randn(D) * 0.02
    reg("audio_branch.patch_embed.norm.weight", pe_ln_w)
    reg("audio_branch.patch_embed.norm.bias", pe_ln_b)

    blocks = {}
    for s in range(len(depths)):
        dim = D * 2 ** s
        for j in range(depths[s]):
            b = {}
            b["norm1"] = (torch.randn(dim).abs() + 0.5, torch.randn(dim) * 0.02)
            b["qkv"] = (torch.randn(3 * dim, dim) * 0.05, torch.randn(3 * dim) * 0.02)
            b["proj"] = (torch.randn(dim, dim) * 0.05, torch.randn(dim) * 0.02)
            b["bias_table"] = torch.randn((2 * ws - 1) ** 2, heads[s]) * 0.05
            b["norm2"] = (torch.randn(dim).abs() + 0.5, torch.randn(dim) * 0.02)
            fd = int(dim * cfg.mlp_ratio)
            b["fc1"] = (torch.randn(fd, dim) * 0.05, torch.randn(fd) * 0.02)
            b["fc2"] = (torch.randn(dim, fd) * 0.05, torch.randn(dim) * 0.02)
            blocks[(s, j)] = b
            pre = f"audio_branch.layers.{s}.blocks.{j}."
            reg(pre + "norm1.weight", b["norm1"][0]); reg(pre + "norm1.bias", b["norm1"][1])
            reg(pre + "attn.qkv.weight", b["qkv"][0]); reg(pre + "attn.qkv.bias", b["qkv"][1])
            reg(pre + "attn.proj.weight", b["proj"][0]); reg(pre + "attn.proj.bias", b["proj"][1])
            reg(pre + "attn.relative_position_bias_table", b["bias_table"])
            reg(pre + "norm2.weight", b["norm2"][0]); reg(pre + "norm2.bias", b["norm2"][1])
            reg(pre + "mlp.fc1.weight", b["fc1"][0]); reg(pre + "mlp.fc1.bias", b["fc1"][1])
            reg(pre + "mlp.fc2.weight", b["fc2"][0]); reg(pre + "mlp.fc2.bias", b["fc2"][1])
        if s < len(depths) - 1:
            dn_w = torch.randn(4 * dim).abs() + 0.5
            dn_b = torch.randn(4 * dim) * 0.02
            rd_w = torch.randn(2 * dim, 4 * dim) * 0.05
            reg(f"audio_branch.layers.{s}.downsample.norm.weight", dn_w)
            reg(f"audio_branch.layers.{s}.downsample.norm.bias", dn_b)
            reg(f"audio_branch.layers.{s}.downsample.reduction.weight", rd_w)
            blocks[("down", s)] = (dn_w, dn_b, rd_w)

    latent = D * 2 ** (len(depths) - 1)
    fn_w = torch.randn(latent).abs() + 0.5
    fn_b = torch.randn(latent) * 0.02
    reg("audio_branch.norm.weight", fn_w)
    reg("audio_branch.norm.bias", fn_b)
    ap0 = (torch.randn(cfg.embedding_dim, latent) * 0.05, torch.randn(cfg.embedding_dim) * 0.02)
    ap2 = (torch.randn(cfg.embedding_dim, cfg.embedding_dim) * 0.05,
           torch.randn(cfg.embedding_dim) * 0.02)
    reg("audio_projection.0.weight", ap0[0]); reg("audio_projection.0.bias", ap0[1])
    reg("audio_projection.2.weight", ap2[0]); reg("audio_projection.2.bias", ap2[1])

    # ---- torch oracle forward ----
    target_T, target_F = S * fr, S // fr
    mel_t = torch.randn(2, target_T, target_F) * 2.0 - 4.0

    def t_layer_norm(x, w, b):
        return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-5)

    x = mel_t[:, None]                                   # B,1,T,F
    x = (x - bn_m.view(1, 1, 1, -1)) / torch.sqrt(bn_v.view(1, 1, 1, -1) + 1e-5)
    x = x * bn_w.view(1, 1, 1, -1) + bn_b.view(1, 1, 1, -1)
    # fold T/F to square (no resize needed at target size)
    B = x.shape[0]
    x = x.permute(0, 1, 3, 2)                            # B,1,F,T
    x = x.reshape(B, 1, target_F, fr, target_T // fr)
    x = x.permute(0, 1, 3, 2, 4).reshape(B, 1, fr * target_F, target_T // fr)
    x = F.conv2d(x, pe_w, pe_b, stride=p)                # B,D,gh,gw
    gh = gw = S // p
    x = x.flatten(2).transpose(1, 2)                     # B,N,D
    x = t_layer_norm(x, pe_ln_w, pe_ln_b)

    H = W = gh
    for s in range(len(depths)):
        dim = D * 2 ** s
        nh = heads[s]
        cur_ws = min(ws, H)
        for j in range(depths[s]):
            b = blocks[(s, j)]
            shift = 0 if (j % 2 == 0 or cur_ws == H) else cur_ws // 2
            shortcut = x
            h = t_layer_norm(x, *b["norm1"]).reshape(B, H, W, dim)
            if shift:
                h = torch.roll(h, (-shift, -shift), dims=(1, 2))
            hw = h.reshape(B, H // cur_ws, cur_ws, W // cur_ws, cur_ws, dim)
            hw = hw.permute(0, 1, 3, 2, 4, 5).reshape(-1, cur_ws * cur_ws, dim)
            qkv = F.linear(hw, *b["qkv"]).reshape(hw.shape[0], -1, 3, nh, dim // nh)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            att = (q @ k.transpose(-2, -1)) * (dim // nh) ** -0.5
            idx = torch.tensor(_rel_position_index(cur_ws).reshape(-1))
            bias = b["bias_table"][idx].reshape(cur_ws ** 2, cur_ws ** 2, nh)
            att = att + bias.permute(2, 0, 1)[None]
            if shift:
                m = torch.tensor(_shift_mask(H, W, cur_ws, shift))
                nw = m.shape[0]
                att = att.reshape(B, nw, nh, cur_ws ** 2, cur_ws ** 2)
                att = att + m[None, :, None]
                att = att.reshape(-1, nh, cur_ws ** 2, cur_ws ** 2)
            att = att.softmax(-1)
            out = (att @ v).transpose(1, 2).reshape(hw.shape[0], -1, dim)
            out = F.linear(out, *b["proj"])
            out = out.reshape(B, H // cur_ws, W // cur_ws, cur_ws, cur_ws, dim)
            out = out.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, dim)
            if shift:
                out = torch.roll(out, (shift, shift), dims=(1, 2))
            x = shortcut + out.reshape(B, H * W, dim)
            h2 = t_layer_norm(x, *b["norm2"])
            h2 = F.linear(h2, *b["fc1"])
            h2 = F.gelu(h2, approximate="none")
            x = x + F.linear(h2, *b["fc2"])
        if ("down", s) in blocks:
            dn_w, dn_b, rd_w = blocks[("down", s)]
            xg = x.reshape(B, H, W, dim)
            x0, x1 = xg[:, 0::2, 0::2], xg[:, 1::2, 0::2]
            x2, x3 = xg[:, 0::2, 1::2], xg[:, 1::2, 1::2]
            xg = torch.cat([x0, x1, x2, x3], -1).reshape(B, -1, 4 * dim)
            xg = t_layer_norm(xg, dn_w, dn_b)
            x = F.linear(xg, rd_w)
            H //= 2
            W //= 2
    x = t_layer_norm(x, fn_w, fn_b)
    lat_t = x.mean(1)
    emb_t = F.linear(F.relu(F.linear(lat_t, *ap0)), *ap2)

    # ---- our import + forward ----
    params = htsat_params_from_laion_clap(sd, cfg)
    mel_j = jnp.asarray(mel_t.numpy())
    lat_j = htsat_latent(params, cfg, mel_j)
    h = jlinear(lat_j, params["audio_projection"]["fc1"]["w"],
                params["audio_projection"]["fc1"]["b"])
    emb_j = jlinear(jnp.maximum(h, 0), params["audio_projection"]["fc2"]["w"],
                    params["audio_projection"]["fc2"]["b"])

    np.testing.assert_allclose(np.asarray(lat_j), lat_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(), atol=2e-4, rtol=1e-3)


def _tiny_fusion_cfg():
    from clipcap_tpu.models.htsat import HTSATConfig

    return HTSATConfig(spec_size=64, embed_dim=16, depths=(1, 1), heads=(2, 4),
                       window_size=4, freq_ratio=4, n_mels=64, latent_dim=32,
                       embedding_dim=16, enable_fusion=True, name="fusion-tiny")


def test_fusion_short_audio_matches_plain_path():
    """Audio ≤ 10 s through the fusion model (4 replicated channels,
    longer=False) must equal the plain path on the same mel — the fusion
    branch is gated off per sample exactly like laion_clap's ``longer``."""
    import jax.numpy as jnp

    from clipcap_tpu.models.htsat import htsat_latent, htsat_latent_fusion, init_htsat

    cfg = _tiny_fusion_cfg()
    params = init_htsat(cfg, seed=3)
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 256, 64)).astype(np.float32) * 2 - 4

    plain = htsat_latent(params, cfg, jnp.asarray(mel))
    fused = htsat_latent_fusion(params, cfg, jnp.asarray(np.stack([mel] * 4, axis=1)))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fusion_long_audio_uses_full_duration():
    """>10 s audio: the fusion input is built from the whole waveform and
    the embedding must differ from the truncate-to-10s embedding (the
    reference's silent behavior, clap.py:121)."""
    import jax.numpy as jnp

    from clipcap_tpu.models.htsat import (
        clap_audio_embedding, clap_audio_embedding_fusion, init_htsat,
    )
    from clipcap_tpu.ops.audio import CLAP_CHUNK_FRAMES, build_mel_fusion

    cfg = _tiny_fusion_cfg()
    params = init_htsat(cfg, seed=3)
    rng = np.random.default_rng(1)
    # 25 s with a loud event in the last 5 s — invisible to the truncated path.
    wav = rng.normal(size=(25 * 48000,)).astype(np.float32) * 0.05
    wav[-5 * 48000:] += np.sin(np.arange(5 * 48000) * 0.2).astype(np.float32)

    fusion_in = build_mel_fusion(wav)
    assert fusion_in.shape == (4, CLAP_CHUNK_FRAMES, 64)
    emb_fused = clap_audio_embedding_fusion(params, cfg, jnp.asarray(fusion_in)[None])
    emb_trunc = clap_audio_embedding(params, cfg, jnp.asarray(wav)[None])
    assert np.isfinite(np.asarray(emb_fused)).all()
    assert not np.allclose(np.asarray(emb_fused), np.asarray(emb_trunc), atol=1e-3)


def test_fusion_checkpoint_import_and_aff_oracle():
    """Fusion-key import (mel_conv2d + fusion_model AFF) mapped from
    laion_clap layout, with the AFF module cross-checked against a torch
    Sequential oracle (Conv1x1/BatchNorm2d inference semantics)."""
    import torch
    import jax.numpy as jnp

    from clipcap_tpu.models.htsat import aff_fuse, htsat_params_from_laion_clap

    cfg = _tiny_fusion_cfg()
    torch.manual_seed(1)
    D, inter, p = cfg.embed_dim, cfg.embed_dim // 4, cfg.patch_size

    sd = {}
    # minimal trunk tensors (reuse init-time shapes)
    sd["audio_branch.bn0.weight"] = torch.ones(cfg.n_mels)
    sd["audio_branch.bn0.bias"] = torch.zeros(cfg.n_mels)
    sd["audio_branch.bn0.running_mean"] = torch.zeros(cfg.n_mels)
    sd["audio_branch.bn0.running_var"] = torch.ones(cfg.n_mels)
    sd["audio_branch.patch_embed.proj.weight"] = torch.randn(D, 1, p, p) * 0.05
    sd["audio_branch.patch_embed.proj.bias"] = torch.zeros(D)
    sd["audio_branch.patch_embed.norm.weight"] = torch.ones(D)
    sd["audio_branch.patch_embed.norm.bias"] = torch.zeros(D)
    for s in range(len(cfg.depths)):
        dim = D * 2 ** s
        for j in range(cfg.depths[s]):
            pre = f"audio_branch.layers.{s}.blocks.{j}."
            sd[pre + "norm1.weight"] = torch.ones(dim); sd[pre + "norm1.bias"] = torch.zeros(dim)
            sd[pre + "attn.qkv.weight"] = torch.randn(3 * dim, dim) * 0.05
            sd[pre + "attn.qkv.bias"] = torch.zeros(3 * dim)
            sd[pre + "attn.proj.weight"] = torch.randn(dim, dim) * 0.05
            sd[pre + "attn.proj.bias"] = torch.zeros(dim)
            sd[pre + "attn.relative_position_bias_table"] = torch.randn((2 * cfg.window_size - 1) ** 2, cfg.heads[s]) * 0.05
            sd[pre + "norm2.weight"] = torch.ones(dim); sd[pre + "norm2.bias"] = torch.zeros(dim)
            fd = int(dim * cfg.mlp_ratio)
            sd[pre + "mlp.fc1.weight"] = torch.randn(fd, dim) * 0.05
            sd[pre + "mlp.fc1.bias"] = torch.zeros(fd)
            sd[pre + "mlp.fc2.weight"] = torch.randn(dim, fd) * 0.05
            sd[pre + "mlp.fc2.bias"] = torch.zeros(dim)
        if s < len(cfg.depths) - 1:
            sd[f"audio_branch.layers.{s}.downsample.norm.weight"] = torch.ones(4 * dim)
            sd[f"audio_branch.layers.{s}.downsample.norm.bias"] = torch.zeros(4 * dim)
            sd[f"audio_branch.layers.{s}.downsample.reduction.weight"] = torch.randn(2 * dim, 4 * dim) * 0.05
    latent = D * 2 ** (len(cfg.depths) - 1)
    sd["audio_branch.norm.weight"] = torch.ones(latent)
    sd["audio_branch.norm.bias"] = torch.zeros(latent)
    sd["audio_projection.0.weight"] = torch.randn(cfg.embedding_dim, latent) * 0.05
    sd["audio_projection.0.bias"] = torch.zeros(cfg.embedding_dim)
    sd["audio_projection.2.weight"] = torch.randn(cfg.embedding_dim, cfg.embedding_dim) * 0.05
    sd["audio_projection.2.bias"] = torch.zeros(cfg.embedding_dim)

    # fusion tensors
    sd["audio_branch.patch_embed.mel_conv2d.weight"] = torch.randn(D, 1, p, 3 * p) * 0.05
    sd["audio_branch.patch_embed.mel_conv2d.bias"] = torch.zeros(D)
    local = torch.nn.Sequential(
        torch.nn.Conv2d(D, inter, 1), torch.nn.BatchNorm2d(inter), torch.nn.ReLU(),
        torch.nn.Conv2d(inter, D, 1), torch.nn.BatchNorm2d(D))
    glob = torch.nn.Sequential(
        torch.nn.AdaptiveAvgPool2d(1),
        torch.nn.Conv2d(D, inter, 1), torch.nn.BatchNorm2d(inter), torch.nn.ReLU(),
        torch.nn.Conv2d(inter, D, 1), torch.nn.BatchNorm2d(D))
    local.eval(); glob.eval()
    with torch.no_grad():  # non-trivial BN stats
        for bn in (local[1], local[4], glob[2], glob[5]):
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.normal_(1.0, 0.1)
            bn.bias.normal_(0, 0.1)
    for name, mod in (("local_att", local), ("global_att", glob)):
        for i, m in enumerate(mod):
            if isinstance(m, (torch.nn.Conv2d, torch.nn.BatchNorm2d)):
                pre = f"audio_branch.patch_embed.fusion_model.{name}.{i}."
                sd[pre + "weight"] = m.weight.detach()
                sd[pre + "bias"] = m.bias.detach()
                if isinstance(m, torch.nn.BatchNorm2d):
                    sd[pre + "running_mean"] = m.running_mean.detach()
                    sd[pre + "running_var"] = m.running_var.detach()

    params = htsat_params_from_laion_clap(sd, cfg)
    assert "mel_conv2d" in params["patch_embed"]
    assert "fusion" in params["patch_embed"]

    # AFF oracle: torch forward vs ours on channel-last data.
    gx = torch.randn(2, D, 5, 7)
    rx = torch.randn(2, D, 5, 7)
    with torch.no_grad():
        xa = gx + rx
        wei = torch.sigmoid(local(xa) + glob(xa))
        t_out = 2 * gx * wei + 2 * rx * (1 - wei)
    j_out = aff_fuse(params["patch_embed"]["fusion"],
                     jnp.asarray(gx.permute(0, 2, 3, 1).numpy()),
                     jnp.asarray(rx.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(j_out),
                               t_out.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-4)
