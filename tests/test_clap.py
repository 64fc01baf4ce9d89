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
