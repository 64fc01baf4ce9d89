"""Inference demo CLI — ``python -m clipcap_tpu.inference``.

Reference parity (/root/reference/clipcap/inference/demo.py:15-87): load
model + encoder, embed one sample, nucleus-sample N captions, rerank by
encoder similarity, print all candidates and the best.

The reference demo's rerank is hard-wired to CLAP's 6-tuple forward
(demo.py:53 — it crashes with CLIP); here rerank goes through the encoder's
``similarity`` method so both CLIP and CLAP work.
"""
from __future__ import annotations

from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser, Namespace

import jax.numpy as jnp
import numpy as np

from clipcap_tpu.encoders.base import get_encoder_from_model
from clipcap_tpu.inference.args import add_inference_args
from clipcap_tpu.inference.generate import generate_nucleus_sampling
from clipcap_tpu.models.clipcap import load


def inference_demo(args: Namespace) -> int:
    model, tokenizer = load(
        args.model_path, args.config_path,
        device=args.device, from_checkpoint=args.is_checkpoint,
    )
    if getattr(args, "int8_weights", False):
        from clipcap_tpu.ops.quant import quantize_gpt2_int8

        model.params["lm"] = quantize_gpt2_int8(model.params["lm"])

    text_prefix_tokens = None
    if args.text_prefix is not None:
        text_prefix_tokens = jnp.asarray(
            tokenizer.encode(args.text_prefix), jnp.int32
        )[None, :]

    encode_method, sample_processor = get_encoder_from_model(model, device=args.device)

    sample = sample_processor(args.sample_path)
    media_features = encode_method(sample[None])  # [1, E] or [1, W, E]
    prefix = model.transformer_mapper(jnp.asarray(media_features))

    from clipcap_tpu.inference.serving import maybe_serving_mesh, prepare_model_for_mesh

    mesh = maybe_serving_mesh(args)
    model = prepare_model_for_mesh(model, mesh)  # --mesh-model: TP packing
    captions = generate_nucleus_sampling(
        model, tokenizer, prefix,
        number_to_generate=args.number_to_generate,
        text_prefix_tokens=text_prefix_tokens,
        top_p=args.top_p,
        top_k=args.top_k,
        temperature=args.temperature,
        seed=args.seed,
        int8_kv=getattr(args, "int8_kv_cache", False),
        mesh=mesh,  # --mesh-data/--mesh-model: sharded serving
    )

    similarities = encode_method.similarity(sample, captions)
    best_idx = int(np.argmax(similarities))

    for caption, similarity in zip(captions, similarities.tolist()):
        print("sim", similarity, "caption", caption)
    print("mean sim", float(np.mean(similarities)))
    print("best", captions[best_idx])
    return 0


def run_inference_demo() -> int:
    parser = ArgumentParser(description=__doc__, formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_inference_args(parser)
    args = parser.parse_args()
    return inference_demo(args)


if __name__ == "__main__":
    exit(run_inference_demo())
