"""Numerical parity against the PyTorch stacks (BASELINE.json north star:
token-for-token temp-0 captions, logits within fp32 tolerance).

All comparisons use RANDOM weights converted through the real import paths,
so they run offline: HF transformers GPT-2 / CLIP models are instantiated
from local configs, and the reference's own mapper module is loaded straight
from /root/reference (read-only) — same weights, same inputs, same outputs.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _hf_gpt2(vocab=512, n_embd=64, n_layer=2, n_head=4, n_positions=128):
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFConfig(
        vocab_size=vocab, n_positions=n_positions, n_embd=n_embd,
        n_layer=n_layer, n_head=n_head,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    ))
    hf.eval()
    return hf


def _our_gpt2_from_hf(hf):
    import jax

    from clipcap_tpu.models.gpt2 import GPT2Config
    from clipcap_tpu.models.hf_import import gpt2_params_from_hf

    c = hf.config
    cfg = GPT2Config(vocab_size=c.vocab_size, n_positions=c.n_positions,
                     n_embd=c.n_embd, n_layer=c.n_layer, n_head=c.n_head,
                     name="parity")
    params = gpt2_params_from_hf(hf.state_dict(), cfg)
    return params, cfg


def test_gpt2_logits_match_hf():
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import gpt2_apply

    hf = _hf_gpt2()
    params, cfg = _our_gpt2_from_hf(hf)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12)).astype(np.int64)

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).logits.numpy()

    ours, _ = gpt2_apply(params, cfg, input_ids=jnp.asarray(ids, jnp.int32),
                         dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def test_gpt2_inputs_embeds_and_mask_match_hf():
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.models.gpt2 import gpt2_apply

    hf = _hf_gpt2()
    params, cfg = _our_gpt2_from_hf(hf)

    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(2, 9, cfg.n_embd)).astype(np.float32)
    mask = np.ones((2, 9), dtype=np.int64)
    mask[1, 6:] = 0  # right-padding (the training-path mask shape)

    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(embeds),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()

    ours, _ = gpt2_apply(params, cfg, inputs_embeds=jnp.asarray(embeds),
                         attention_mask=jnp.asarray(mask),
                         dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    # Padded positions produce garbage in both stacks; compare valid ones.
    np.testing.assert_allclose(np.asarray(ours)[0], ref[0], atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours)[1, :6], ref[1, :6], atol=2e-4, rtol=1e-4)


def test_greedy_decode_token_for_token_vs_hf():
    """Temp-0 parity: our KV-cached greedy decode = HF greedy generate."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.inference.engine import SamplingParams, decode
    from clipcap_tpu.models.gpt2 import gpt2_embed_tokens

    hf = _hf_gpt2()
    params, cfg = _our_gpt2_from_hf(hf)

    rng = np.random.default_rng(2)
    prompt = rng.integers(1, cfg.vocab_size, size=(1, 5)).astype(np.int64)
    n_new = 12

    with torch.no_grad():
        ref_out = hf.generate(
            torch.from_numpy(prompt), max_new_tokens=n_new, do_sample=False,
            num_beams=1, pad_token_id=0, eos_token_id=None,
        ).numpy()[0, 5:]

    prefix_embeds = gpt2_embed_tokens(params, jnp.asarray(prompt, jnp.int32),
                                      jnp.float32)
    sp = SamplingParams(max_new_tokens=n_new, mode="greedy", stop_token=-1,
                        repetition_penalty=1.0, sentence_length_factor=0.0,
                        include_stop_token=True)
    result = decode(params, cfg, prefix_embeds, jax.random.PRNGKey(0), sp,
                    dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    ours = np.asarray(result.tokens)[0]
    np.testing.assert_array_equal(ours, ref_out)


def test_clip_matches_hf():
    import jax
    import jax.numpy as jnp

    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    from clipcap_tpu.models.clip_vit import (
        CLIPConfig, CLIPTextConfig, CLIPVisionConfig,
        clip_encode_image, clip_encode_text, clip_params_from_hf,
    )

    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPVisionConfig as HFVisionConfig

    torch.manual_seed(0)
    hf = HFCLIPModel(HFCLIPConfig.from_text_vision_configs(
        # eos_token_id=98: HF pools at the first eos occurrence; our text
        # tower uses the OpenAI argmax-of-ids convention. With the max id 98
        # placed once at the end both pick the same position.
        text_config=HFTextConfig(vocab_size=99, max_position_embeddings=16,
                                 hidden_size=32, num_hidden_layers=2,
                                 num_attention_heads=4, intermediate_size=128,
                                 hidden_act="quick_gelu", eos_token_id=98),
        vision_config=HFVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                                     num_hidden_layers=2, num_attention_heads=4,
                                     intermediate_size=128, hidden_act="quick_gelu"),
        projection_dim=24,
    ))
    hf.eval()

    cfg = CLIPConfig(
        name="parity",
        vision=CLIPVisionConfig(image_size=32, patch_size=16, width=32,
                                layers=2, heads=4, embed_dim=24),
        text=CLIPTextConfig(vocab_size=99, context_length=16, width=32,
                            layers=2, heads=4, embed_dim=24),
    )
    params = clip_params_from_hf(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    # HF expects normalized pixel_values; feed the same tensor to both and
    # disable our internal normalization.
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    tokens = rng.integers(1, 98, size=(2, 16))
    tokens[:, -1] = 98  # max id = EOT position for our argmax pooling

    with torch.no_grad():
        ref_img = hf.get_image_features(pixel_values=torch.from_numpy(pixels)).numpy()
        ref_txt = hf.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()

    ours_img = clip_encode_image(
        params["visual"], cfg.vision,
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),  # NCHW → NHWC
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        normalize_pixels=False,
    )
    np.testing.assert_allclose(np.asarray(ours_img), ref_img, atol=3e-4, rtol=1e-3)

    ours_txt = clip_encode_text(params["text"], cfg.text,
                                jnp.asarray(tokens, jnp.int32),
                                dtype=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(ours_txt), ref_txt, atol=3e-4, rtol=1e-3)


def _load_reference_mapper_module():
    """Load /root/reference/clipcap/model/mapper.py directly (read-only, no
    package import — the reference package pulls in pytorch_lightning)."""
    import types

    spec_att = importlib.util.spec_from_file_location(
        "ref_attention", os.path.join(REFERENCE, "clipcap/model/attention.py"))
    attention = importlib.util.module_from_spec(spec_att)
    spec_att.loader.exec_module(attention)

    pkg_clipcap = types.ModuleType("clipcap")
    pkg_model = types.ModuleType("clipcap.model")
    pkg_attention = types.ModuleType("clipcap.model.attention")
    pkg_attention.MultiHeadAttention = attention.MultiHeadAttention
    sys.modules.setdefault("clipcap", pkg_clipcap)
    sys.modules["clipcap.model"] = pkg_model
    sys.modules["clipcap.model.attention"] = pkg_attention

    spec = importlib.util.spec_from_file_location(
        "ref_mapper", os.path.join(REFERENCE, "clipcap/model/mapper.py"))
    mapper = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mapper)
    return mapper


@pytest.mark.parametrize("windowed", [False, True])
def test_mapper_matches_reference_torch(windowed):
    """Same weights → same prefix, against the reference's own mapper code
    (model/mapper.py:113-160) executed in torch."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.models.mapper import MapperConfig, mapper_apply, mapper_params_from_torch

    ref_mod = _load_reference_mapper_module()
    torch.manual_seed(0)

    E, D, P, L = 48, 32, 6, 5  # encoder dim, lm dim, prefix len, proj len
    heads, layers = 4, 3
    W = 3

    if windowed:
        ref = ref_mod.TransformerMapperWindowed(
            E, D, P, L, window_size=W, use_pos_embeddings=True,
            num_heads=heads, num_layers=layers)
        cfg = MapperConfig(encoder_embedding_size=E, lm_embedding_size=D,
                           prefix_length=P, projection_length=L,
                           num_heads=heads, num_layers=layers,
                           window_size=W, use_pos_embeddings=True)
        x = np.random.default_rng(0).normal(size=(2, W, E)).astype(np.float32)
    else:
        ref = ref_mod.TransformerMapper(E, D, P, L, num_heads=heads,
                                        num_layers=layers)
        cfg = MapperConfig(encoder_embedding_size=E, lm_embedding_size=D,
                           prefix_length=P, projection_length=L,
                           num_heads=heads, num_layers=layers)
        x = np.random.default_rng(0).normal(size=(2, E)).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    params = mapper_params_from_torch(ref.state_dict(), cfg, prefix="")
    ours = mapper_apply(params, cfg, jnp.asarray(x), dtype=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Oracle parity: run the reference's OWN decoder code (loaded standalone from
# /root/reference, torch CPU) against ours, token-for-token, at deterministic
# settings (top_k=1 / top_p→0 makes the multinomial a delta distribution).
# ---------------------------------------------------------------------------

import jax  # noqa: E402 (oracle tests below)
import jax.numpy as jnp  # noqa: E402

REFERENCE_INFER = "/root/reference/clipcap/inference"


def _load_reference_decoders():
    import importlib.util
    import types

    if not os.path.isdir(REFERENCE_INFER):
        pytest.skip("reference checkout not available")

    # Stub the package chain + clipcap.model (imported only for type hints).
    for name in ("clipcap", "clipcap.inference", "clipcap.model"):
        if name not in sys.modules or not hasattr(sys.modules[name], "__path__"):
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules["clipcap.model"].ClipCapModel = object
    sys.modules["clipcap.model"].ClipCapModelPrefixOnly = object

    def load(stem):
        full = f"clipcap.inference.{stem}"
        if full in sys.modules and hasattr(sys.modules[full], "__file__"):
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(
            full, f"{REFERENCE_INFER}/{stem}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    load("utils")
    return load("no_beam"), load("nucleus_sampling"), load("base")


class _RefModelWrapper:
    """Duck-typed stand-in for the reference ClipCapModel: the decoders only
    touch ``.language_model``."""

    def __init__(self, hf_lm):
        self.language_model = hf_lm


def _tiny_pair():
    """A tiny HF GPT-2 and its converted JAX twin + byte-level tokenizer."""
    import torch
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from clipcap_tpu.models.clipcap import ClipCapModel
    from clipcap_tpu.models.gpt2 import GPT2Config
    from clipcap_tpu.models.hf_import import gpt2_params_from_hf
    from clipcap_tpu.models.mapper import MapperConfig, init_mapper
    from clipcap_tpu.utils.tokenizer import get_tokenizer
    from clipcap_tpu.config import Config, EncoderConfig

    torch.manual_seed(0)
    hf_cfg = HFConfig(vocab_size=50257, n_positions=128, n_embd=64,
                      n_layer=2, n_head=4)
    hf = GPT2LMHeadModel(hf_cfg).eval()

    cfg = GPT2Config(vocab_size=50257, n_positions=128, n_embd=64,
                     n_layer=2, n_head=4, name="tiny")
    params = gpt2_params_from_hf(hf.state_dict(), cfg)

    config = Config(language_model="tiny", prefix_length=4, projection_length=4,
                    transformer_layers=2, transformer_attention_heads=4,
                    encoder_config=EncoderConfig(encoder_embedding_size=16))
    mcfg = MapperConfig(encoder_embedding_size=16, lm_embedding_size=64,
                        prefix_length=4, projection_length=4,
                        num_layers=2, num_heads=4)
    model = ClipCapModel(config=config, lm_config=cfg, mapper_config=mcfg,
                         params={"mapper": init_mapper(mcfg, seed=0), "lm": params})
    return hf, model, get_tokenizer("tiny")


def test_no_beam_decoder_matches_reference_code():
    import torch

    ref_no_beam, _, _ = _load_reference_decoders()
    hf, model, tok = _tiny_pair()

    from clipcap_tpu.inference.generate import generate_no_beam

    rng = np.random.default_rng(5)
    prefix = (rng.normal(size=(1, 4, 64)) * 0.02).astype(np.float32)

    ref_out = ref_no_beam.generate_no_beam(
        _RefModelWrapper(hf), tok, torch.tensor(prefix),
        number_to_generate=1, top_k=1, top_p=0.0, temperature=1.0,
        repetition_penalty=1.2, desired_sentence_length=10,
        sentence_length_factor=1.0, entry_length=12,
    )
    ours = generate_no_beam(
        model, tok, jnp.asarray(prefix),
        number_to_generate=1, top_k=1, top_p=0.0, temperature=1.0,
        repetition_penalty=1.2, desired_sentence_length=10,
        sentence_length_factor=1.0, entry_length=12,
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    assert ours[0] == ref_out[0], (ours, ref_out)


def test_nucleus_decoder_matches_reference_code():
    import torch

    _, ref_nucleus, _ = _load_reference_decoders()
    hf, model, tok = _tiny_pair()

    from clipcap_tpu.inference.generate import generate_nucleus_sampling

    rng = np.random.default_rng(9)
    prefix = (rng.normal(size=(1, 4, 64)) * 0.02).astype(np.float32)

    # top_p -> 0 keeps only the argmax after renormalization: deterministic.
    ref_out = ref_nucleus.generate_nucleus_sampling(
        _RefModelWrapper(hf), tok, torch.tensor(prefix),
        number_to_generate=1, top_p=1e-9, temperature=1.0, entry_length=12,
    )
    ours = generate_nucleus_sampling(
        model, tok, jnp.asarray(prefix),
        number_to_generate=1, top_p=1e-9, temperature=1.0, entry_length=12,
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    assert ours[0] == ref_out[0], (ours, ref_out)


def test_beam_decoder_matches_reference_code():
    import torch

    _, _, ref_base = _load_reference_decoders()
    hf, model, tok = _tiny_pair()

    from clipcap_tpu.inference.generate import generate_beam

    rng = np.random.default_rng(3)
    prefix = (rng.normal(size=(1, 4, 64)) * 0.02).astype(np.float32)

    ref_out = ref_base.generate_beam(
        _RefModelWrapper(hf), tok, torch.tensor(prefix),
        beam_size=4, entry_length=10, temperature=1.0,
    )
    ours = generate_beam(
        model, tok, jnp.asarray(prefix),
        beam_size=4, entry_length=10, temperature=1.0,
        number_to_generate=4,
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    # Reference returns the single best caption (list of generations per
    # sample); ours returns candidates best-first.
    ref_best = ref_out[0] if isinstance(ref_out, list) else ref_out
    assert ours[0] == ref_best, (ours, ref_best)


def test_roberta_matches_hf():
    """CLAP text tower: our RoBERTa forward vs HF RobertaModel, same random
    weights through the real import path, padded batch included."""
    from transformers import RobertaConfig as HFRobertaConfig, RobertaModel

    from clipcap_tpu.models.roberta import (
        roberta_apply, roberta_config_from_hf, roberta_params_from_hf,
    )

    torch.manual_seed(0)
    hf_cfg = HFRobertaConfig(vocab_size=120, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=4,
                             intermediate_size=64, max_position_embeddings=24,
                             type_vocab_size=1, pad_token_id=1)
    hf = RobertaModel(hf_cfg).eval()

    cfg = roberta_config_from_hf(hf_cfg)
    params = roberta_params_from_hf(hf.state_dict(), cfg)

    ids = np.array([[0, 10, 11, 12, 2, 1, 1, 1],
                    [0, 55, 2, 1, 1, 1, 1, 1]], np.int64)
    mask = (ids != 1).astype(np.int64)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))

    hidden, pooled = roberta_apply(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    # pad positions may differ (HF computes them; values are unused) — compare
    # real positions only.
    for b in range(ids.shape[0]):
        real = mask[b].astype(bool)
        np.testing.assert_allclose(
            np.asarray(hidden)[b][real],
            out.last_hidden_state.numpy()[b][real], atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_no_beam_with_text_prefix_matches_reference_code():
    """VQA-style text prefix (reference no_beam.py:29-33): prefix token
    embeddings concat after the mapper prefix, and the prefix tokens seed
    the repetition-penalty buffer. Token-for-token vs the reference code."""
    import torch

    ref_no_beam, _, _ = _load_reference_decoders()
    hf, model, tok = _tiny_pair()

    from clipcap_tpu.inference.generate import generate_no_beam

    rng = np.random.default_rng(11)
    prefix = (rng.normal(size=(1, 4, 64)) * 0.02).astype(np.float32)
    text_prefix = np.array([[50256, 64, 65, 66]], np.int64)  # bos + 3 tokens

    ref_out = ref_no_beam.generate_no_beam(
        _RefModelWrapper(hf), tok, torch.tensor(prefix),
        text_prefix_tokens=torch.tensor(text_prefix),
        number_to_generate=1, top_k=1, top_p=0.0, temperature=1.0,
        repetition_penalty=1.2, desired_sentence_length=8,
        sentence_length_factor=1.0, entry_length=10,
    )
    ours = generate_no_beam(
        model, tok, jnp.asarray(prefix),
        text_prefix_tokens=jnp.asarray(text_prefix, jnp.int32),
        number_to_generate=1, top_k=1, top_p=0.0, temperature=1.0,
        repetition_penalty=1.2, desired_sentence_length=8,
        sentence_length_factor=1.0, entry_length=10,
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    assert ours[0] == ref_out[0], (ours, ref_out)


def test_beam_temperature_matches_reference_code():
    """Beam with temperature != 1 (scales logits before the log-softmax,
    base.py:84) — token-for-token vs the reference's own code."""
    import torch

    _, _, ref_base = _load_reference_decoders()
    hf, model, tok = _tiny_pair()

    from clipcap_tpu.inference.generate import generate_beam

    rng = np.random.default_rng(21)
    prefix = (rng.normal(size=(1, 4, 64)) * 0.02).astype(np.float32)

    ref_out = ref_base.generate_beam(
        _RefModelWrapper(hf), tok, torch.tensor(prefix),
        beam_size=3, entry_length=9, temperature=0.7,
    )
    ours = generate_beam(
        model, tok, jnp.asarray(prefix),
        beam_size=3, entry_length=9, temperature=0.7, number_to_generate=3,
        dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    ref_best = ref_out[0] if isinstance(ref_out, list) else ref_out
    assert ours[0] == ref_best, (ours, ref_best)
