"""CLIP ModifiedResNet tower: torch-oracle parity + config/preset checks.

The reference encodes through ``clip.load(variant)`` which serves the RN50
family alongside the ViTs (/root/reference/clipcap/encoders/clip.py:134-136).
The oracle below is a clean-room torch implementation of the published
ModifiedResNet architecture (3-conv stem, anti-aliased avg-pool
downsampling, attention-pool head) built with the OpenAI state-dict key
names, so the SAME state dict drives both frameworks — weights flow through
``resnet_params_from_openai`` exactly as a real RN50.pt would.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clipcap_tpu.models.clip_resnet import (  # noqa: E402
    CLIPResNetConfig,
    clip_encode_image_resnet,
    resnet_config_from_openai,
    resnet_params_from_openai,
)

# ---------------------------------------------------------------------------
# Torch oracle (OpenAI ModifiedResNet semantics, OpenAI state-dict keys)
# ---------------------------------------------------------------------------


class _Bottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.stride = stride
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            # OpenAI ordering AND naming: OrderedDict("-1" pool, "0" conv,
            # "1" bn) — the conv's state-dict key is downsample.0.weight
            from collections import OrderedDict
            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride)),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _AttentionPool2d(torch.nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        nn = torch.nn
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :].to(x.dtype)
        x, _ = torch.nn.functional.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1],
            num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]),
            bias_k=None, bias_v=None,
            add_zero_attn=False,
            dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            training=False,
            need_weights=False,
        )
        return x.squeeze(0)


class _ModifiedResNet(torch.nn.Module):
    def __init__(self, layers, output_dim, heads, input_resolution, width):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)

        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = _AttentionPool2d(
            input_resolution // 32, width * 32, heads, output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [_Bottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * _Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(_Bottleneck(self._inplanes, planes))
        return torch.nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.attnpool(x)


def _randomized(model: torch.nn.Module, seed: int) -> torch.nn.Module:
    """Randomize every parameter AND the BN running stats so the imported
    pre-reduced scale/bias form is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.5)
    return model.eval()


def _visual_sd(model: torch.nn.Module) -> dict:
    return {f"visual.{k}": v for k, v in model.state_dict().items()}


TINY = dict(layers=(2, 2, 2, 2), output_dim=32, heads=4,
            input_resolution=64, width=16)


def test_resnet_forward_matches_torch_oracle(rng):
    oracle = _randomized(_ModifiedResNet(**TINY), seed=0)
    sd = _visual_sd(oracle)

    cfg = CLIPResNetConfig(image_size=TINY["input_resolution"],
                           width=TINY["width"], layers=TINY["layers"],
                           heads=TINY["heads"], embed_dim=TINY["output_dim"])
    params = resnet_params_from_openai(sd, cfg)

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.5 + 0.5
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    got = clip_encode_image_resnet(
        params, cfg, jnp.asarray(x), dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST, normalize_pixels=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_resnet_config_inference_from_state_dict():
    oracle = _ModifiedResNet(**TINY)
    sd = _visual_sd(oracle)
    cfg = resnet_config_from_openai(sd)
    assert cfg.width == TINY["width"]
    assert cfg.layers == TINY["layers"]
    assert cfg.embed_dim == TINY["output_dim"]
    assert cfg.image_size == TINY["input_resolution"]
    assert cfg.heads == TINY["width"] * 32 // 64


def test_rn_presets_match_openai_shapes():
    """Preset sanity: the five published RN variants resolve with the known
    stage plans, input sizes and embed dims (clip.load's catalog)."""
    from clipcap_tpu.models.clip_vit import get_clip_config

    expect = {
        "RN50": ((3, 4, 6, 3), 64, 224, 1024, 512),
        "RN101": ((3, 4, 23, 3), 64, 224, 512, 512),
        "RN50x4": ((4, 6, 10, 6), 80, 288, 640, 640),
        "RN50x16": ((6, 8, 18, 8), 96, 384, 768, 768),
        "RN50x64": ((3, 15, 36, 10), 128, 448, 1024, 1024),
    }
    for name, (layers, width, img, embed, twidth) in expect.items():
        cfg = get_clip_config(name)
        v = cfg.vision
        assert v.layers == layers and v.width == width, name
        assert v.image_size == img and v.embed_dim == embed, name
        assert v.heads == width * 32 // 64, name
        assert cfg.text.width == twidth and cfg.text.embed_dim == embed, name
        # reference CLI mangling: RN names carry no "/" so they round-trip
        assert get_clip_config(name.replace("/", "_")).name == name


def test_rn_full_checkpoint_roundtrip(rng):
    """A full OpenAI-layout RN state dict (visual + text towers) loads
    through clip_params_from_openai/clip_config_from_openai and produces
    working similarity logits."""
    from clipcap_tpu.models.clip_vit import (
        clip_config_from_openai,
        clip_params_from_openai,
        clip_similarity,
    )

    oracle = _randomized(_ModifiedResNet(**TINY), seed=1)
    sd = _visual_sd(oracle)

    # minimal matching text tower in the OpenAI layout
    tw, tl, ctx, vocab = 64, 2, 16, 64
    g = torch.Generator().manual_seed(7)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd.update({
        "token_embedding.weight": t(vocab, tw),
        "positional_embedding": t(ctx, tw),
        "ln_final.weight": torch.ones(tw), "ln_final.bias": torch.zeros(tw),
        "text_projection": t(tw, TINY["output_dim"]),
        "logit_scale": torch.tensor(2.0),
    })
    for i in range(tl):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": torch.ones(tw), f"{p}.ln_1.bias": torch.zeros(tw),
            f"{p}.attn.in_proj_weight": t(3 * tw, tw),
            f"{p}.attn.in_proj_bias": torch.zeros(3 * tw),
            f"{p}.attn.out_proj.weight": t(tw, tw),
            f"{p}.attn.out_proj.bias": torch.zeros(tw),
            f"{p}.ln_2.weight": torch.ones(tw), f"{p}.ln_2.bias": torch.zeros(tw),
            f"{p}.mlp.c_fc.weight": t(4 * tw, tw),
            f"{p}.mlp.c_fc.bias": torch.zeros(4 * tw),
            f"{p}.mlp.c_proj.weight": t(tw, 4 * tw),
            f"{p}.mlp.c_proj.bias": torch.zeros(tw),
        })

    cfg = clip_config_from_openai(sd)
    assert cfg.vision.layers == TINY["layers"]
    assert cfg.text.width == tw and cfg.text.layers == tl
    params = clip_params_from_openai(sd, cfg)

    imgs = jnp.asarray((rng.random((1, 64, 64, 3)) * 255).astype(np.uint8))
    tokens = jnp.asarray(rng.integers(1, vocab, (3, ctx)), jnp.int32)
    li, lt = clip_similarity(params, cfg, imgs, tokens)
    assert li.shape == (1, 3) and lt.shape == (3, 1)
    assert np.isfinite(np.asarray(li)).all()


def test_rn_encoder_registry_e2e(rng, tmp_path):
    """get_encoder('clip', 'test-tiny-rn') → (model, transform) drives
    file → transform → batched embeddings, including the windowed path and
    the rerank similarity (the encoder surface preprocess/inference use)."""
    from PIL import Image

    from clipcap_tpu.encoders.base import get_encoder

    model, transform = get_encoder("clip", "test-tiny-rn")
    assert model.embedding_size == 32

    path = tmp_path / "img.png"
    Image.fromarray((rng.random((80, 70, 3)) * 255).astype(np.uint8)).save(path)
    sample = transform(str(path))
    assert sample.shape == (64, 64, 3) and sample.dtype == np.uint8

    out = model(np.stack([sample, sample]))
    assert out.shape == (2, 32) and out.dtype == np.float32
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)

    sims = model.similarity(sample, ["a dog", "a cat"])
    assert sims.shape == (2,) and np.isfinite(sims).all()

    # windowed: global + 4 tiles
    model_w, transform_w = get_encoder(
        "clip", "test-tiny-rn", use_windowed_embeddings=True, window_size=4)
    sample_w = transform_w(str(path))
    assert sample_w.shape == (5, 64, 64, 3)
    out_w = model_w(sample_w[None])
    assert out_w.shape == (1, 5, 32)

    # int8 serving is ViT-only
    with pytest.raises(ValueError, match="ViT-only"):
        get_encoder("clip", "test-tiny-rn", int8=True)


@pytest.mark.slow
def test_rn_preprocess_train_caption_end_to_end(tmp_path):
    """The full CLI slice on an RN variant: preprocess → train → caption
    (VERDICT r4 #2 'runs preprocess→caption end-to-end'; same artifact
    contract as the ViT path)."""
    import os

    import jax.numpy as jnp
    from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

    from test_pipeline import _make_files_dataset, _run_preprocess

    data = _make_files_dataset(tmp_path / "raw", n=6)
    out = str(tmp_path / "dataset")
    rc = _run_preprocess([
        "--input-dataset", data, "--output-folder", out,
        "--input-format", "files", "--batch-size", "3", "--workers", "1",
        "--encoder-model-name", "clip", "--encoder-model-variant", "test-tiny-rn",
    ])
    assert rc == 0
    embeds = np.load(os.path.join(out, "embeddings", "embeds_0.npy"))
    assert embeds.shape == (6, 32)

    from clipcap_tpu.models.args import add_model_args
    from clipcap_tpu.train.args import add_training_args
    from clipcap_tpu.train.train import train as run_train

    models_out = str(tmp_path / "models")
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_training_args(parser)
    parser = add_model_args(parser)
    args = parser.parse_args([
        "--input-dataset", out, "--output-folder", models_out,
        "--language-model", "gpt2-test", "--batch-size", "6", "--epochs", "1",
        "--scheduler-warmup-steps", "1", "--logging-frequency", "1",
        "--prefix-length", "4", "--projection-length", "4",
        "--transformer-layers", "2", "--transformer-attention-heads", "4",
    ])
    assert run_train(args) == 0

    from clipcap_tpu.inference.generate import generate
    from clipcap_tpu.models.clipcap import load
    from clipcap_tpu.utils.tokenizer import ByteTokenizer

    model, _ = load(os.path.join(models_out, "clipcap_final.npz"),
                    os.path.join(models_out, "clipcap_config.yaml"))
    captions = generate(model, ByteTokenizer(), jnp.asarray(embeds[:1]),
                        number_to_generate=1, seed=0)
    assert len(captions) == 1 and isinstance(captions[0], str)
