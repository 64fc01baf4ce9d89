"""End-to-end pipeline: fabricate a tiny dataset → preprocess (files and
webdataset CLIs) → train CLI → load() → caption.  Runs on the virtual CPU
mesh with the test-scale model presets (SURVEY.md §4c)."""
import io
import json
import os
import sys
import tarfile
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_image_bytes(rng, size=48):
    from PIL import Image

    arr = (rng.uniform(0, 255, size=(size, size, 3))).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _make_files_dataset(path, n=10):
    rng = np.random.default_rng(0)
    path.mkdir(exist_ok=True)
    for i in range(n):
        (path / f"sample_{i:03d}.png").write_bytes(_make_image_bytes(rng))
        (path / f"sample_{i:03d}.txt").write_text(f"a tiny test image number {i}")
    return str(path)


def _make_webdataset(path, n_shards=2, per_shard=6):
    rng = np.random.default_rng(1)
    path.mkdir(exist_ok=True)
    idx = 0
    for s in range(n_shards):
        with tarfile.open(path / f"shard-{s:04d}.tar", "w") as tar:
            for _ in range(per_shard):
                img = _make_image_bytes(rng)
                meta = json.dumps({"caption": f"wds caption {idx}"}).encode()
                for name, data in ((f"{idx:06d}.jpg", img), (f"{idx:06d}.json", meta)):
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    tar.addfile(info, io.BytesIO(data))
                idx += 1
    return str(path / ("shard-{0000..%04d}.tar" % (n_shards - 1)))


def _run_preprocess(argv):
    from clipcap_tpu.encoders.args import add_encoder_args
    from clipcap_tpu.preprocess.args import add_preprocess_args
    from clipcap_tpu.preprocess.preprocess import preprocess

    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_preprocess_args(parser)
    parser = add_encoder_args(parser)
    return preprocess(parser.parse_args(argv))


def test_braceexpand():
    from clipcap_tpu.utils.braceexpand import braceexpand

    assert list(braceexpand("shard-{0000..0002}.tar")) == [
        "shard-0000.tar", "shard-0001.tar", "shard-0002.tar"
    ]
    assert list(braceexpand("{a,b}/x-{1..2}")) == ["a/x-1", "a/x-2", "b/x-1", "b/x-2"]
    assert list(braceexpand("plain.tar")) == ["plain.tar"]


@pytest.mark.slow
def test_preprocess_files_and_train_and_caption(tmp_path):
    import pandas as pd
    import yaml

    data = _make_files_dataset(tmp_path / "raw", n=10)
    out = str(tmp_path / "dataset")

    rc = _run_preprocess([
        "--input-dataset", data, "--output-folder", out,
        "--input-format", "files", "--batch-size", "4", "--workers", "2",
        "--encoder-model-name", "clip", "--encoder-model-variant", "test-tiny",
    ])
    assert rc == 0

    # Output contract (reference writer.py): embeds npy + captions parquet + yaml
    embeds = np.load(os.path.join(out, "embeddings", "embeds_0.npy"))
    caps = pd.read_parquet(os.path.join(out, "captions", "captions_0.parquet"))
    assert embeds.shape == (10, 32)
    assert list(caps.columns) == ["caption"]
    assert len(caps) == 10
    with open(os.path.join(out, "encoder_config.yaml")) as f:
        enc_cfg = yaml.safe_load(f)
    assert enc_cfg["encoder_model_name"] == "clip"
    assert enc_cfg["encoder_embedding_size"] == 32

    # ---- train CLI on the preprocessed output -----------------------------
    from clipcap_tpu.models.args import add_model_args
    from clipcap_tpu.train.args import add_training_args
    from clipcap_tpu.train.train import train as run_train

    models_out = str(tmp_path / "models")
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_training_args(parser)
    parser = add_model_args(parser)
    args = parser.parse_args([
        "--input-dataset", out, "--output-folder", models_out,
        "--language-model", "gpt2-test", "--batch-size", "8", "--epochs", "1",
        "--scheduler-warmup-steps", "1", "--logging-frequency", "1",
        "--prefix-length", "4", "--projection-length", "4",
        "--transformer-layers", "2", "--transformer-attention-heads", "4",
    ])
    assert run_train(args) == 0
    assert os.path.exists(os.path.join(models_out, "clipcap_final.npz"))
    assert os.path.exists(os.path.join(models_out, "clipcap_config.yaml"))

    # ---- load + caption ----------------------------------------------------
    import jax.numpy as jnp

    from clipcap_tpu.inference.generate import generate
    from clipcap_tpu.models.clipcap import load
    from clipcap_tpu.utils.tokenizer import ByteTokenizer

    model, _tok = load(
        os.path.join(models_out, "clipcap_final.npz"),
        os.path.join(models_out, "clipcap_config.yaml"),
    )
    tok = ByteTokenizer()  # deterministic offline tokenizer
    captions = generate(model, tok, jnp.asarray(embeds[:1]), number_to_generate=2, seed=0)
    assert len(captions) == 2
    assert all(isinstance(c, str) for c in captions)


def test_preprocess_webdataset(tmp_path):
    import pandas as pd

    pattern = _make_webdataset(tmp_path / "shards")
    out = str(tmp_path / "wds_dataset")

    rc = _run_preprocess([
        "--input-dataset", pattern, "--output-folder", out,
        "--input-format", "webdataset", "--batch-size", "5", "--workers", "2",
        "--wds-media-key", "jpg", "--wds-caption-key", "json/caption",
        "--wds-samples-per-file", "6",
        "--encoder-model-name", "clip", "--encoder-model-variant", "test-tiny",
    ])
    assert rc == 0
    embeds = np.load(os.path.join(out, "embeddings", "embeds_0.npy"))
    caps = pd.read_parquet(os.path.join(out, "captions", "captions_0.parquet"))
    assert embeds.shape == (12, 32)
    assert caps["caption"].tolist() == [f"wds caption {i}" for i in range(12)]


def test_preprocess_windowed_files(tmp_path):
    """Windowed embeddings: [N, window+1, E] layout (reference clip.py:96-99)."""
    data = _make_files_dataset(tmp_path / "raw", n=4)
    out = str(tmp_path / "win_dataset")

    rc = _run_preprocess([
        "--input-dataset", data, "--output-folder", out,
        "--input-format", "files", "--batch-size", "2", "--workers", "1",
        "--encoder-model-name", "clip", "--encoder-model-variant", "test-tiny",
        "--use-windowed-embeddings", "true", "--window-size", "4",
    ])
    assert rc == 0
    embeds = np.load(os.path.join(out, "embeddings", "embeds_0.npy"))
    assert embeds.shape == (4, 5, 32)  # global + 4 tiles


def test_sampler_partitions():
    from clipcap_tpu.preprocess.runner import Sampler

    items = list(range(10))
    parts = [Sampler(i, 3)(items) for i in range(3)]
    assert parts[0] == [0, 3, 6, 9]
    assert parts[1] == [1, 4, 7]
    assert sorted(sum(parts, [])) == items


@pytest.mark.slow
def test_windowed_end_to_end(tmp_path):
    """Windowed embeddings through the FULL pipeline: preprocess (tiled
    encoder output [N, W+1, E]) -> train a windowed mapper (learned pos
    embeddings over (W+1)·proj_len prefix slots, reference mapper.py:133-160)
    -> load -> caption."""
    import jax.numpy as jnp
    import yaml

    from clipcap_tpu.inference.generate import generate_beam
    from clipcap_tpu.models.clipcap import load
    from clipcap_tpu.utils.tokenizer import ByteTokenizer

    data = _make_files_dataset(tmp_path / "raw", n=8)
    out = str(tmp_path / "win_ds")
    rc = _run_preprocess([
        "--input-dataset", data, "--output-folder", out,
        "--input-format", "files", "--batch-size", "4", "--workers", "1",
        "--encoder-model-name", "clip", "--encoder-model-variant", "test-tiny",
        "--use-windowed-embeddings", "true", "--window-size", "4",
    ])
    assert rc == 0
    embeds = np.load(os.path.join(out, "embeddings", "embeds_0.npy"))
    assert embeds.shape == (8, 5, 32)

    from clipcap_tpu.models.args import add_model_args
    from clipcap_tpu.train.args import add_training_args
    from clipcap_tpu.train.train import train as run_train

    models_out = str(tmp_path / "win_models")
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_training_args(parser)
    parser = add_model_args(parser)
    args = parser.parse_args([
        "--input-dataset", out, "--output-folder", models_out,
        "--language-model", "gpt2-test", "--batch-size", "4", "--epochs", "1",
        "--scheduler-warmup-steps", "1", "--logging-frequency", "1",
        "--prefix-length", "4", "--projection-length", "4",
        "--transformer-layers", "2", "--transformer-attention-heads", "4",
    ])
    assert run_train(args) == 0

    with open(os.path.join(models_out, "clipcap_config.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["encoder_config"]["use_windowed_embeddings"] is True

    model, _ = load(os.path.join(models_out, "clipcap_final.npz"),
                    os.path.join(models_out, "clipcap_config.yaml"))
    assert model.mapper_config.windowed
    prefix = model.transformer_mapper(jnp.asarray(embeds[:1]))  # [1, W, E] in
    assert prefix.shape == (1, 4, model.lm_config.n_embd)
    caps = generate_beam(model, ByteTokenizer(), prefix,
                         beam_size=3, entry_length=8, number_to_generate=2)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path):
    """Full eval stage: batched generation (encoder -> mapper -> nucleus
    decode -> similarity rerank) + CSV join + native metric scoring — the
    path the reference ships commented out (eval/base.py:35-80)."""
    import pandas as pd

    data = _make_files_dataset(tmp_path / "raw", n=6)
    out = str(tmp_path / "dataset")
    assert _run_preprocess([
        "--input-dataset", data, "--output-folder", out,
        "--input-format", "files", "--batch-size", "3", "--workers", "1",
        "--encoder-model-name", "clip", "--encoder-model-variant", "test-tiny",
    ]) == 0

    from clipcap_tpu.models.args import add_model_args
    from clipcap_tpu.train.args import add_training_args
    from clipcap_tpu.train.train import train as run_train

    models_out = str(tmp_path / "models")
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_training_args(parser)
    parser = add_model_args(parser)
    assert run_train(parser.parse_args([
        "--input-dataset", out, "--output-folder", models_out,
        "--language-model", "gpt2-test", "--batch-size", "4", "--epochs", "1",
        "--scheduler-warmup-steps", "1", "--prefix-length", "4",
        "--projection-length", "4", "--transformer-layers", "2",
        "--transformer-attention-heads", "4",
    ])) == 0

    # Eval folder: a subset of the images, references with 2 caption columns.
    eval_dir = tmp_path / "eval_samples"
    eval_dir.mkdir()
    rows = []
    for i in range(3):
        name = f"ev_{i}.png"
        (eval_dir / name).write_bytes(
            _make_image_bytes(np.random.default_rng(100 + i)))
        rows.append({"file_name": name, **{
            f"cap_{j}": f"a tiny test image number {i} variant {j}"
            for j in range(1, 6)}})
    csv_path = str(tmp_path / "refs.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    from clipcap_tpu.eval.args import add_eval_args
    from clipcap_tpu.eval.base import eval as run_eval
    from clipcap_tpu.inference.args import add_inference_args

    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_eval_args(parser)
    parser = add_inference_args(parser)
    preds_json = str(tmp_path / "preds.json")
    scores_json = str(tmp_path / "scores.json")
    args = parser.parse_args([
        "--model-path", os.path.join(models_out, "clipcap_final.npz"),
        "--config-path", os.path.join(models_out, "clipcap_config.yaml"),
        "--sample-path", str(eval_dir),
        "--reference-csv", csv_path,
        "--csv-filename-column", "file_name",
        "--csv-reference-caption-columns", "cap_{1..5}",
        "--eval-batch-size", "2",  # 3 samples -> full batch + padded tail
        "--number-to-generate", "2",
        "--allow-fallback-tokenizer",  # offline CI has no GPT-2 vocab files
        "--save-predictions", preds_json,
        "--save-file", scores_json,
    ])
    assert run_eval(args) == 0

    preds = json.load(open(preds_json))
    assert set(preds) == {"ev_0.png", "ev_1.png", "ev_2.png"}
    assert all(isinstance(v, str) for v in preds.values())
    scores = json.load(open(scores_json))
    for key in ("bleu_1", "bleu_4", "rouge_l", "cider", "meteor", "spice", "spider"):
        assert any(key in k.lower() for k in scores), (key, scores.keys())

    # Sharded serving through the SAME CLI surface: --mesh-data 2 x
    # --mesh-model 4 on the virtual 8-device mesh.  prepare_model_for_mesh
    # re-packs the LM head-major and decode runs tensor-parallel over the
    # ``model`` axis; with fp32 compute and a seeded sampler the
    # predictions must equal the single-device run's exactly.
    preds_tp_json = str(tmp_path / "preds_tp.json")
    tp_args = parser.parse_args([
        "--model-path", os.path.join(models_out, "clipcap_final.npz"),
        "--config-path", os.path.join(models_out, "clipcap_config.yaml"),
        "--sample-path", str(eval_dir),
        "--reference-csv", csv_path,
        "--csv-filename-column", "file_name",
        "--csv-reference-caption-columns", "cap_{1..5}",
        "--eval-batch-size", "2",
        "--number-to-generate", "2",
        "--allow-fallback-tokenizer",
        "--mesh-data", "2", "--mesh-model", "4",
        "--save-predictions", preds_tp_json,
    ])
    assert run_eval(tp_args) == 0
    assert json.load(open(preds_tp_json)) == preds

    # Without --allow-fallback-tokenizer, eval must REFUSE to score with the
    # byte-fallback tokenizer (ids don't match a pretrained GPT-2, so the
    # scores would be silently meaningless).
    import pytest

    from clipcap_tpu.eval.base import prepare_model

    strict_args = parser.parse_args([
        "--model-path", os.path.join(models_out, "clipcap_final.npz"),
        "--config-path", os.path.join(models_out, "clipcap_config.yaml"),
        "--sample-path", str(eval_dir),
        "--reference-csv", csv_path,
    ])
    with pytest.raises(RuntimeError, match="byte-level"):
        prepare_model(strict_args)


def test_load_reference_torch_checkpoint(tmp_path):
    """load() must accept a reference-layout torch checkpoint
    ('transformer_mapper.*' + 'language_model.*' keys, model/load.py:29-34)
    and produce the same captions as the in-framework weights."""
    import torch
    import yaml
    import jax.numpy as jnp
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from clipcap_tpu.config import Config, EncoderConfig, save_yaml_config
    from clipcap_tpu.inference.generate import generate_beam
    from clipcap_tpu.models.clipcap import load
    from clipcap_tpu.utils.tokenizer import ByteTokenizer

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFConfig(vocab_size=50257, n_positions=128, n_embd=64,
                                  n_layer=2, n_head=4)).eval()

    # Reference-style mapper weights (TransformerMapper state dict layout).
    D, E, P = 64, 16, 4
    mapper_sd = {
        "transformer_mapper.linear.weight": torch.randn(P * D, E) * 0.02,
        "transformer_mapper.linear.bias": torch.zeros(P * D),
        "transformer_mapper.prefix_const": torch.randn(P, D),
    }
    for i in range(2):
        pre = f"transformer_mapper.transformer.layers.{i}."
        mapper_sd.update({
            pre + "norm1.weight": torch.ones(D), pre + "norm1.bias": torch.zeros(D),
            pre + "attn.to_queries.weight": torch.randn(D, D) * 0.02,
            pre + "attn.to_keys_values.weight": torch.randn(2 * D, D) * 0.02,
            pre + "attn.project.weight": torch.randn(D, D) * 0.02,
            pre + "attn.project.bias": torch.zeros(D),
            pre + "norm2.weight": torch.ones(D), pre + "norm2.bias": torch.zeros(D),
            pre + "mlp.fc1.weight": torch.randn(2 * D, D) * 0.02,
            pre + "mlp.fc1.bias": torch.zeros(2 * D),
            pre + "mlp.fc2.weight": torch.randn(D, 2 * D) * 0.02,
            pre + "mlp.fc2.bias": torch.zeros(D),
        })
    sd = dict(mapper_sd)
    sd.update({f"language_model.{k}": v for k, v in hf.state_dict().items()})

    ckpt_path = str(tmp_path / "reference_model.pt")
    torch.save(sd, ckpt_path)

    config = Config(language_model="gpt2-test", prefix_length=P,
                    projection_length=P, transformer_layers=2,
                    transformer_attention_heads=4,
                    encoder_config=EncoderConfig(encoder_embedding_size=E))
    # gpt2-test preset must match the HF dims used above
    cfg_path = str(tmp_path / "config.yaml")
    save_yaml_config(config, cfg_path)

    model, tok = load(ckpt_path, cfg_path)
    # LM weights actually came from the torch checkpoint
    np.testing.assert_allclose(
        np.asarray(model.params["lm"]["wte"]),
        hf.state_dict()["transformer.wte.weight"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(model.params["mapper"]["prefix_const"]),
        mapper_sd["transformer_mapper.prefix_const"].numpy(), atol=1e-6)

    emb = jnp.asarray(np.random.default_rng(0).normal(size=(1, E)), jnp.float32)
    prefix = model.transformer_mapper(emb)
    caps = generate_beam(model, ByteTokenizer(), prefix, beam_size=3,
                         entry_length=6, number_to_generate=1)
    assert caps and isinstance(caps[0], str)


def test_preprocess_warns_and_continues_on_corrupt_media(tmp_path):
    """Fault tolerance parity (reference wds.handlers.warn_and_continue,
    reader.py:89,123): a corrupt image must be skipped, not crash the run."""
    data = _make_files_dataset(tmp_path / "raw", n=4)
    (tmp_path / "raw" / "sample_999.png").write_bytes(b"not an image at all")
    (tmp_path / "raw" / "sample_999.txt").write_text("caption of junk")

    out = str(tmp_path / "dataset")
    rc = _run_preprocess([
        "--input-dataset", data, "--output-folder", out,
        "--input-format", "files", "--batch-size", "2", "--workers", "1",
        "--encoder-model-name", "clip", "--encoder-model-variant", "test-tiny",
    ])
    assert rc == 0
    embeds = np.load(os.path.join(out, "embeddings", "embeds_0.npy"))
    assert embeds.shape[0] == 4  # corrupt sample dropped, good ones kept
